// SPDX-License-Identifier: MIT
pragma solidity ^0.8.22;

/// @notice Inclusion proof against an RFC-6962-style binary Merkle tree with
///         an arbitrary (non-power-of-two) number of leaves, as used by
///         Celestia / Blobstream data commitments. Left subtree size at every
///         split is the largest power of two strictly smaller than the node's
///         leaf count. Side nodes are ordered deepest-first (leaf → root).
struct BinaryMerkleProof {
    bytes32[] sideNodes;
    uint256 key;
    uint256 numLeaves;
}

library BinaryMerkleTree {
    bytes1 private constant LEAF_PREFIX = 0x00;
    bytes1 private constant INNER_PREFIX = 0x01;

    /// @notice sha256(0x00 ‖ data) — RFC 6962 leaf hash.
    function leafHash(bytes memory data) internal pure returns (bytes32) {
        return sha256(abi.encodePacked(LEAF_PREFIX, data));
    }

    /// @notice sha256(0x01 ‖ left ‖ right) — RFC 6962 inner hash.
    function innerHash(bytes32 left, bytes32 right)
        internal
        pure
        returns (bytes32)
    {
        return sha256(abi.encodePacked(INNER_PREFIX, left, right));
    }

    /// @notice Largest power of two strictly less than `n` (n >= 2).
    function splitPoint(uint256 n) internal pure returns (uint256 k) {
        k = 1;
        while (k << 1 < n) {
            k <<= 1;
        }
    }

    /// @notice Verify that `data` is the `proof.key`-th of `proof.numLeaves`
    ///         leaves under `root`. Returns (valid, errorCode) where
    ///         errorCode 0 = ok, 1 = key out of range, 2 = wrong proof
    ///         length, 3 = root mismatch.
    function verify(
        bytes32 root,
        BinaryMerkleProof memory proof,
        bytes memory data
    ) internal pure returns (bool, uint256) {
        if (proof.numLeaves == 0 || proof.key >= proof.numLeaves) {
            return (false, 1);
        }
        if (proof.sideNodes.length != pathLength(proof.key, proof.numLeaves)) {
            return (false, 2);
        }
        bytes32 computed = _climb(
            leafHash(data), proof.key, proof.numLeaves, proof.sideNodes
        );
        if (computed != root) {
            return (false, 3);
        }
        return (true, 0);
    }

    /// @notice Number of side nodes on the path of leaf `key` in a tree of
    ///         `num` leaves (trees are unbalanced: depth varies per leaf).
    function pathLength(uint256 key, uint256 num)
        internal
        pure
        returns (uint256 len)
    {
        while (num > 1) {
            uint256 k = splitPoint(num);
            if (key < k) {
                num = k;
            } else {
                key -= k;
                num -= k;
            }
            len++;
        }
    }

    /// @dev Iteratively fold `leaf` with the side nodes. The recursion of
    ///      the build-time split is replayed bottom-up: we first descend the
    ///      split structure to record, per level, whether the leaf sits in
    ///      the left or right child, then combine deepest-first — matching
    ///      the deepest-first sideNodes order.
    function _climb(
        bytes32 leaf,
        uint256 key,
        uint256 num,
        bytes32[] memory sideNodes
    ) private pure returns (bytes32 node) {
        uint256 depth = sideNodes.length;
        // record left/right direction per level, root-down
        bool[] memory fromLeft = new bool[](depth);
        uint256 lvl = 0;
        uint256 k_ = key;
        uint256 n_ = num;
        while (n_ > 1) {
            uint256 k = splitPoint(n_);
            if (k_ < k) {
                fromLeft[lvl] = true;
                n_ = k;
            } else {
                fromLeft[lvl] = false;
                k_ -= k;
                n_ -= k;
            }
            lvl++;
        }
        // fold leaf→root; sideNodes[0] is the deepest sibling
        node = leaf;
        for (uint256 i = 0; i < depth; i++) {
            uint256 level = depth - 1 - i; // deepest level first
            if (fromLeft[level]) {
                node = innerHash(node, sideNodes[i]);
            } else {
                node = innerHash(sideNodes[i], node);
            }
        }
    }
}

"""Validate the Solidity BinaryMerkleTree algorithm (contracts/src/lib/
BinaryMerkleTree.sol) by mirroring its iterative `_climb` + `pathLength`
logic in python and cross-checking against the recursive verifier in
runtime/contract.py over randomized RFC-6962 trees with arbitrary leaf
counts (reference parity: celestiaorg BinaryMerkleTree used by
contracts/src/BlobstreamX.sol:274 in /root/reference)."""

import random

from blobstreamx_tpu.runtime import contract as ct
from blobstreamx_tpu.tendermint import merkle


def _split_point(n):
    k = 1
    while k << 1 < n:
        k <<= 1
    return k


def _path_length(key, num):
    ln = 0
    while num > 1:
        k = _split_point(num)
        if key < k:
            num = k
        else:
            key -= k
            num -= k
        ln += 1
    return ln


def _climb_sol(leaf, key, num, side_nodes):
    """Line-for-line python mirror of BinaryMerkleTree._climb."""
    depth = len(side_nodes)
    from_left = [False] * depth
    lvl, k_, n_ = 0, key, num
    while n_ > 1:
        k = _split_point(n_)
        if k_ < k:
            from_left[lvl] = True
            n_ = k
        else:
            k_ -= k
            n_ -= k
        lvl += 1
    node = leaf
    for i in range(depth):
        level = depth - 1 - i
        if from_left[level]:
            node = merkle.inner_hash(node, side_nodes[i])
        else:
            node = merkle.inner_hash(side_nodes[i], node)
    return node


def _verify_sol(root, proof, data):
    if proof.num_leaves == 0 or proof.key >= proof.num_leaves:
        return False
    if len(proof.side_nodes) != _path_length(proof.key, proof.num_leaves):
        return False
    return _climb_sol(merkle.leaf_hash(data), proof.key, proof.num_leaves,
                      proof.side_nodes) == root


def test_sol_merkle_matches_python_over_random_trees():
    rng = random.Random(7)
    for num in [1, 2, 3, 4, 5, 7, 8, 11, 16, 33]:
        items = [rng.randbytes(64) for _ in range(num)]
        root, proofs = merkle.proofs_from_byte_slices(items)
        for idx in range(num):
            proof = ct.BinaryMerkleProof(
                side_nodes=list(proofs[idx]), key=idx, num_leaves=num)
            assert _verify_sol(root, proof, items[idx])
            assert ct._binary_merkle_verify(root, proof, items[idx])
            # tampered leaf rejected by both
            bad = items[idx] + b"x"
            assert not _verify_sol(root, proof, bad)
            assert not ct._binary_merkle_verify(root, proof, bad)


def test_sol_merkle_rejects_malformed_proofs():
    rng = random.Random(9)
    items = [rng.randbytes(32) for _ in range(6)]
    root, proofs = merkle.proofs_from_byte_slices(items)
    ok = ct.BinaryMerkleProof(side_nodes=list(proofs[2]), key=2, num_leaves=6)
    assert _verify_sol(root, ok, items[2])
    # key out of range
    assert not _verify_sol(root, ct.BinaryMerkleProof(
        side_nodes=list(proofs[2]), key=6, num_leaves=6), items[2])
    # truncated / extended side-node lists
    assert not _verify_sol(root, ct.BinaryMerkleProof(
        side_nodes=list(proofs[2])[:-1], key=2, num_leaves=6), items[2])
    assert not _verify_sol(root, ct.BinaryMerkleProof(
        side_nodes=list(proofs[2]) + [b"\x00" * 32], key=2, num_leaves=6),
        items[2])
    # num_leaves implying a different path length is rejected
    assert not _verify_sol(root, ct.BinaryMerkleProof(
        side_nodes=list(proofs[2]), key=2, num_leaves=3), items[2])

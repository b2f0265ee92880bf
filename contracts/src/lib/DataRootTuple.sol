// SPDX-License-Identifier: MIT
pragma solidity ^0.8.22;

/// @notice One Celestia block's (height, dataRoot) pair — the Merkle leaf
///         of every stored data commitment. ABI-encoding of this struct
///         (64 bytes: height left-padded to 32 ‖ dataRoot) is the preimage
///         hashed by the circuits' `encode_data_root_tuple`
///         (blobstreamx_tpu/circuits/builder.py) and by the celestiaorg
///         Blobstream spec.
struct DataRootTuple {
    uint256 height;
    bytes32 dataRoot;
}

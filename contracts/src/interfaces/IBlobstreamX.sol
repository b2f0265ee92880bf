// SPDX-License-Identifier: MIT
pragma solidity ^0.8.22;

/// @title IBlobstreamX — events and errors of the BlobstreamX light client.
/// @notice External surface parity with the reference
///         contracts/src/interfaces/IBlobstreamX.sol (R14); re-implemented
///         for the blobstreamx_tpu proving stack.
interface IBlobstreamX {
    /// @notice A new head (trusted header hash) was committed.
    event HeadUpdate(uint64 blockNumber, bytes32 headerHash);

    /// @notice A data commitment for [startBlock, endBlock) was stored
    ///         under `proofNonce`.
    event DataCommitmentStored(
        uint256 proofNonce,
        uint64 indexed startBlock,
        uint64 indexed endBlock,
        bytes32 indexed dataCommitment
    );

    /// @notice A next-header (single step) proof was requested.
    event NextHeaderRequested(
        uint64 indexed trustedBlock, bytes32 indexed trustedHeader
    );

    /// @notice A header-range (skip) proof was requested.
    event HeaderRangeRequested(
        uint64 indexed trustedBlock,
        bytes32 indexed trustedHeader,
        uint64 indexed targetBlock
    );

    error TrustedHeaderNotFound();
    error LatestHeaderNotFound();
    error TargetBlockNotInRange();
    error ContractFrozen();
    error TrustedBlockMismatch();
    error DataCommitmentNotFound();
}

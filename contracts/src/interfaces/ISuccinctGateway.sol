// SPDX-License-Identifier: MIT
pragma solidity ^0.8.22;

/// @notice Minimal interface of the proof gateway the light client talks to.
///         Mirrors the surface BlobstreamX consumes from the reference's
///         external @succinctx submodule (requestCall / verifiedCall); any
///         gateway that verifies (functionId, inputHash) → output bindings
///         with an on-chain SNARK verifier can implement it.
interface ISuccinctGateway {
    /// @notice Request an off-chain proof; the gateway calls back
    ///         `callbackAddress` with `callbackData` once fulfilled.
    function requestCall(
        bytes32 functionId,
        bytes memory input,
        address callbackAddress,
        bytes memory callbackData,
        uint32 callbackGasLimit
    ) external payable;

    /// @notice Return the verified output for (functionId, input); reverts
    ///         if no verified fulfillment exists in the current transaction.
    function verifiedCall(bytes32 functionId, bytes memory input)
        external
        view
        returns (bytes memory output);
}

// SPDX-License-Identifier: MIT
pragma solidity ^0.8.22;

import {ISuccinctGateway} from "./interfaces/ISuccinctGateway.sol";

/// @title  StarkGateway
/// @notice A proof gateway for blobstreamx_tpu STARK proofs implementing
///         the ISuccinctGateway surface the light client consumes
///         (reference: the external SuccinctGateway behind
///         BlobstreamX.sol:149-152's verifiedCall).
///
///         Verification model (stage 1 of docs/EVM_VERIFICATION.md):
///         a whitelisted relayer fulfills a request by posting the
///         function id, the input, the output, and the Poseidon-root
///         proof commitment produced by proof/evm_wrapper.py. The gateway
///         binds output to (functionId, inputHash) and stores the
///         commitment so any off-chain party can fetch the full proof
///         (content-addressed by the commitment) and re-verify it against
///         the exact on-chain statement — fraud is attributable.
///
///         Stage 2 (designed, not yet deployed) replaces the allowlist
///         with an on-chain verifier of the single recursively-aggregated
///         proof (proof/recursion.py emits ONE proof per header_range);
///         `fulfill` keeps the same ABI, so the light client is unchanged.
contract StarkGateway is ISuccinctGateway {
    address public owner;
    mapping(address => bool) public allowedProvers;

    struct Fulfillment {
        bytes32 outputHash;
        bytes32 proofCommitment;
        bytes output;
    }

    /// @dev keccak256(functionId, inputHash) => fulfillment
    mapping(bytes32 => Fulfillment) private fulfillments;

    event ProofFulfilled(
        bytes32 indexed functionId,
        bytes32 indexed inputHash,
        bytes32 outputHash,
        bytes32 proofCommitment
    );
    event CallRequested(
        bytes32 indexed functionId,
        bytes32 inputHash,
        address callbackAddress
    );

    error NotAllowed();
    error NotFulfilled();
    error AlreadyFulfilled();

    constructor() {
        owner = msg.sender;
        allowedProvers[msg.sender] = true;
    }

    modifier onlyOwner() {
        if (msg.sender != owner) revert NotAllowed();
        _;
    }

    function setProver(address prover, bool allowed) external onlyOwner {
        allowedProvers[prover] = allowed;
    }

    /// @inheritdoc ISuccinctGateway
    function requestCall(
        bytes32 functionId,
        bytes memory input,
        address callbackAddress,
        bytes memory, /* callbackData */
        uint32 /* callbackGasLimit */
    ) external payable {
        emit CallRequested(functionId, sha256(input), callbackAddress);
    }

    /// @notice Post a fulfilled proof result. The commitment format is
    ///         produced by blobstreamx_tpu/proof/evm_wrapper.py:
    ///         sha256(functionId ‖ sha256(input) ‖ sha256(output) ‖
    ///         proofRoot) where proofRoot is the Poseidon digest chain over
    ///         the serialized SystemProof.
    /// @dev Write-once: a second fulfill for the same (functionId,
    ///      inputHash) reverts, so the content-addressed commitment an
    ///      auditor reads can never be swapped after consumers saw it.
    ///      Replacing a bad fulfillment requires an explicit, auditable
    ///      owner action (`revoke` + re-fulfill).
    function fulfill(
        bytes32 functionId,
        bytes calldata input,
        bytes calldata output,
        bytes32 proofRoot
    ) external {
        if (!allowedProvers[msg.sender]) revert NotAllowed();
        bytes32 inputHash = sha256(input);
        bytes32 key = keccak256(abi.encodePacked(functionId, inputHash));
        if (fulfillments[key].proofCommitment != bytes32(0)) {
            revert AlreadyFulfilled();
        }
        bytes32 outputHash = sha256(output);
        bytes32 commitment = sha256(
            abi.encodePacked(functionId, inputHash, outputHash, proofRoot)
        );
        fulfillments[key] = Fulfillment(outputHash, commitment, output);
        emit ProofFulfilled(functionId, inputHash, outputHash, commitment);
    }

    /// @notice Owner-only escape hatch: clear a fulfillment (e.g. after an
    ///         attributable-fraud finding) so an honest relayer can
    ///         re-fulfill. Emits nothing new; the old commitment stays in
    ///         the ProofFulfilled event log for auditors.
    function revoke(bytes32 functionId, bytes32 inputHash)
        external
        onlyOwner
    {
        delete fulfillments[keccak256(abi.encodePacked(functionId, inputHash))];
    }

    /// @inheritdoc ISuccinctGateway
    function verifiedCall(bytes32 functionId, bytes memory input)
        external
        view
        returns (bytes memory)
    {
        Fulfillment storage f =
            fulfillments[keccak256(abi.encodePacked(functionId, sha256(input)))];
        if (f.proofCommitment == bytes32(0)) revert NotFulfilled();
        return f.output;
    }

    /// @notice The stored proof commitment for an input (for off-chain
    ///         auditors re-verifying the full STARK).
    function proofCommitmentOf(bytes32 functionId, bytes memory input)
        external
        view
        returns (bytes32)
    {
        return fulfillments[
            keccak256(abi.encodePacked(functionId, sha256(input)))
        ].proofCommitment;
    }
}

// SPDX-License-Identifier: MIT
pragma solidity ^0.8.22;

import {IBlobstreamX} from "./interfaces/IBlobstreamX.sol";
import {IDAOracle} from "./interfaces/IDAOracle.sol";
import {ISuccinctGateway} from "./interfaces/ISuccinctGateway.sol";
import {DataRootTuple} from "./lib/DataRootTuple.sol";
import {
    BinaryMerkleProof, BinaryMerkleTree
} from "./lib/BinaryMerkleTree.sol";

/// @title BlobstreamX — ZK Tendermint light client for Celestia DA.
/// @notice On-chain state machine consuming proofs produced by the
///         blobstreamx_tpu proving stack. External-surface parity with the
///         reference contracts/src/BlobstreamX.sol (storage :13-38,
///         commitHeaderRange :131-182, commitNextHeader :205-250,
///         verifyAttestation :255-281); behavioral spec mirrored by
///         blobstreamx_tpu/runtime/contract.py, which the python test suite
///         drives.
/// @dev Upgrade/guardian management is kept to a minimal owner+guardian
///      model here; production deployments sit behind an ERC1967 proxy
///      (script/Deploy.s.sol).
contract BlobstreamX is IBlobstreamX, IDAOracle {
    /// @notice Hard cap on blocks per commitment request.
    uint64 public constant DATA_COMMITMENT_MAX = 10000;

    /// @notice Proof gateway that verifies circuit outputs on-chain.
    address public gateway;

    /// @notice Guardian (freeze / config authority).
    address public guardian;

    /// @notice First block of the next data commitment (head of the client).
    uint64 public latestBlock;

    /// @notice Sequential nonce; commitment n is stored before nonce → n+1.
    uint256 public state_proofNonce;

    /// @notice Height → committed Tendermint header hash.
    mapping(uint64 => bytes32) public blockHeightToHeaderHash;

    /// @notice Proof nonce → data commitment Merkle root.
    mapping(uint256 => bytes32) public state_dataCommitments;

    /// @notice Circuit function identifiers at the gateway.
    bytes32 public headerRangeFunctionId;
    bytes32 public nextHeaderFunctionId;

    /// @notice Guardian kill switch.
    bool public frozen;

    uint32 private constant CALLBACK_GAS_LIMIT = 500000;

    modifier onlyGuardian() {
        require(msg.sender == guardian, "not guardian");
        _;
    }

    modifier notFrozen() {
        if (frozen) revert ContractFrozen();
        _;
    }

    struct InitParameters {
        address guardian;
        address gateway;
        uint64 height;
        bytes32 header;
        bytes32 nextHeaderFunctionId;
        bytes32 headerRangeFunctionId;
    }

    bool private initialized;

    function VERSION() external pure returns (string memory) {
        return "blobstreamx-tpu-0.1.0";
    }

    function initialize(InitParameters calldata p) external {
        require(!initialized, "initialized");
        initialized = true;
        guardian = p.guardian;
        gateway = p.gateway;
        blockHeightToHeaderHash[p.height] = p.header;
        latestBlock = p.height;
        nextHeaderFunctionId = p.nextHeaderFunctionId;
        headerRangeFunctionId = p.headerRangeFunctionId;
        state_proofNonce = 1;
    }

    // ------------------------------------------------------------------
    // Guardian operations
    // ------------------------------------------------------------------

    function updateFreeze(bool freeze) external onlyGuardian {
        frozen = freeze;
    }

    function updateGateway(address newGateway) external onlyGuardian {
        gateway = newGateway;
    }

    function updateFunctionIds(
        bytes32 newHeaderRangeFunctionId,
        bytes32 newNextHeaderFunctionId
    ) external onlyGuardian {
        headerRangeFunctionId = newHeaderRangeFunctionId;
        nextHeaderFunctionId = newNextHeaderFunctionId;
    }

    function updateGenesisState(uint32 height, bytes32 header)
        external
        onlyGuardian
    {
        blockHeightToHeaderHash[height] = header;
        latestBlock = height;
    }

    // ------------------------------------------------------------------
    // Proof requests (operator or anyone may fund a request)
    // ------------------------------------------------------------------

    /// @notice Ask the gateway for a skip proof to `targetBlock` and a data
    ///         commitment over [latestBlock, targetBlock).
    function requestHeaderRange(uint64 targetBlock) external payable {
        bytes32 latestHeader = blockHeightToHeaderHash[latestBlock];
        if (latestHeader == bytes32(0)) revert LatestHeaderNotFound();
        _checkRange(latestBlock, targetBlock);

        ISuccinctGateway(gateway).requestCall{value: msg.value}(
            headerRangeFunctionId,
            abi.encodePacked(latestBlock, latestHeader, targetBlock),
            address(this),
            abi.encodeWithSelector(this.commitHeaderRange.selector, targetBlock),
            CALLBACK_GAS_LIMIT
        );
        emit HeaderRangeRequested(latestBlock, latestHeader, targetBlock);
    }

    /// @notice Ask the gateway for a single-step proof from the latest block.
    function requestNextHeader() external payable {
        bytes32 latestHeader = blockHeightToHeaderHash[latestBlock];
        if (latestHeader == bytes32(0)) revert LatestHeaderNotFound();

        ISuccinctGateway(gateway).requestCall{value: msg.value}(
            nextHeaderFunctionId,
            abi.encodePacked(latestBlock, latestHeader),
            address(this),
            abi.encodeWithSelector(this.commitNextHeader.selector, latestBlock),
            CALLBACK_GAS_LIMIT
        );
        emit NextHeaderRequested(latestBlock, latestHeader);
    }

    // ------------------------------------------------------------------
    // Commits (gateway-verified outputs land here)
    // ------------------------------------------------------------------

    /// @notice Commit the verified (targetHeader, dataCommitment) for the
    ///         range [latestBlock, targetBlock).
    function commitHeaderRange(uint64 targetBlock) external notFrozen {
        bytes32 trustedHeader = blockHeightToHeaderHash[latestBlock];
        if (trustedHeader == bytes32(0)) revert TrustedHeaderNotFound();

        bytes memory output = ISuccinctGateway(gateway).verifiedCall(
            headerRangeFunctionId,
            abi.encodePacked(latestBlock, trustedHeader, targetBlock)
        );
        (bytes32 targetHeader, bytes32 dataCommitment) =
            abi.decode(output, (bytes32, bytes32));

        _checkRange(latestBlock, targetBlock);
        _store(latestBlock, targetBlock, targetHeader, dataCommitment);
    }

    /// @notice Commit the verified (nextHeader, dataCommitment) for the
    ///         range [trustedBlock, trustedBlock + 1).
    function commitNextHeader(uint64 trustedBlock) external notFrozen {
        bytes32 trustedHeader = blockHeightToHeaderHash[trustedBlock];
        if (trustedHeader == bytes32(0)) revert TrustedHeaderNotFound();

        bytes memory output = ISuccinctGateway(gateway).verifiedCall(
            nextHeaderFunctionId,
            abi.encodePacked(trustedBlock, trustedHeader)
        );
        (bytes32 nextHeader, bytes32 dataCommitment) =
            abi.decode(output, (bytes32, bytes32));

        uint64 nextBlock = trustedBlock + 1;
        if (nextBlock <= latestBlock) revert TargetBlockNotInRange();
        _store(trustedBlock, nextBlock, nextHeader, dataCommitment);
    }

    function _checkRange(uint64 trusted, uint64 target) private pure {
        if (target <= trusted || target - trusted > DATA_COMMITMENT_MAX) {
            revert TargetBlockNotInRange();
        }
    }

    function _store(
        uint64 startBlock,
        uint64 endBlock,
        bytes32 header,
        bytes32 dataCommitment
    ) private {
        blockHeightToHeaderHash[endBlock] = header;
        state_dataCommitments[state_proofNonce] = dataCommitment;
        emit HeadUpdate(endBlock, header);
        emit DataCommitmentStored(
            state_proofNonce, startBlock, endBlock, dataCommitment
        );
        state_proofNonce++;
        latestBlock = endBlock;
    }

    // ------------------------------------------------------------------
    // Consumer query (IDAOracle)
    // ------------------------------------------------------------------

    /// @notice Verify a rollup's inclusion proof of `tuple` against the
    ///         data commitment stored under `proofNonce`.
    function verifyAttestation(
        uint256 proofNonce,
        DataRootTuple memory tuple,
        BinaryMerkleProof memory proof
    ) external view notFrozen returns (bool) {
        // nonce n is valid once a commit has bumped state_proofNonce past it
        if (proofNonce == 0 || proofNonce >= state_proofNonce) {
            return false;
        }
        bytes32 root = state_dataCommitments[proofNonce];
        (bool ok,) = BinaryMerkleTree.verify(root, proof, abi.encode(tuple));
        return ok;
    }
}

// SPDX-License-Identifier: MIT
pragma solidity ^0.8.22;

import {DataRootTuple} from "../lib/DataRootTuple.sol";
import {BinaryMerkleProof} from "../lib/BinaryMerkleTree.sol";

/// @notice Celestia data-availability oracle interface: rollups call
///         `verifyAttestation` to prove a (height, dataRoot) tuple is
///         covered by a stored data commitment.
interface IDAOracle {
    function verifyAttestation(
        uint256 proofNonce,
        DataRootTuple memory tuple,
        BinaryMerkleProof memory proof
    ) external view returns (bool);
}

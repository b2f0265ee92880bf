// SPDX-License-Identifier: MIT
pragma solidity ^0.8.22;

import {BlobstreamX} from "../src/BlobstreamX.sol";
import {Vm} from "./Deploy.s.sol";

/// @notice Guardian maintenance script: rotate circuit function ids after a
///         circuit change (parity with reference
///         contracts/script/UpdateFunctionIds.s.sol:22-52). Env:
///           CONTRACT_ADDRESS, HEADER_RANGE_FUNCTION_ID,
///           NEXT_HEADER_FUNCTION_ID.
contract UpdateFunctionIds {
    Vm internal constant vm =
        Vm(address(uint160(uint256(keccak256("hevm cheat code")))));

    function run() external {
        vm.startBroadcast();
        BlobstreamX target =
            BlobstreamX(vm.envAddress("CONTRACT_ADDRESS"));
        target.updateFunctionIds(
            vm.envBytes32("HEADER_RANGE_FUNCTION_ID"),
            vm.envBytes32("NEXT_HEADER_FUNCTION_ID")
        );
        vm.stopBroadcast();
    }
}

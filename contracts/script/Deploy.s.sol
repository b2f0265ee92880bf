// SPDX-License-Identifier: MIT
pragma solidity ^0.8.22;

import {BlobstreamX} from "../src/BlobstreamX.sol";

/// @notice Forge deploy script (parity with reference
///         contracts/script/Deploy.s.sol:18-79). Env-driven:
///           GUARDIAN_ADDRESS, GATEWAY_ADDRESS,
///           GENESIS_HEIGHT, GENESIS_HEADER,
///           NEXT_HEADER_FUNCTION_ID, HEADER_RANGE_FUNCTION_ID,
///           CREATE2_SALT.
///         `python -m blobstreamx_tpu.runtime.cli genesis --block N`
///         prints GENESIS_HEIGHT / GENESIS_HEADER.
interface Vm {
    function envAddress(string calldata) external view returns (address);
    function envUint(string calldata) external view returns (uint256);
    function envBytes32(string calldata) external view returns (bytes32);
    function startBroadcast() external;
    function stopBroadcast() external;
}

contract Deploy {
    Vm internal constant vm =
        Vm(address(uint160(uint256(keccak256("hevm cheat code")))));

    function run() external returns (address) {
        vm.startBroadcast();

        bytes32 salt = vm.envBytes32("CREATE2_SALT");
        BlobstreamX lightClient = new BlobstreamX{salt: salt}();

        lightClient.initialize(
            BlobstreamX.InitParameters({
                guardian: vm.envAddress("GUARDIAN_ADDRESS"),
                gateway: vm.envAddress("GATEWAY_ADDRESS"),
                height: uint64(vm.envUint("GENESIS_HEIGHT")),
                header: vm.envBytes32("GENESIS_HEADER"),
                nextHeaderFunctionId: vm.envBytes32("NEXT_HEADER_FUNCTION_ID"),
                headerRangeFunctionId: vm.envBytes32("HEADER_RANGE_FUNCTION_ID")
            })
        );

        vm.stopBroadcast();
        return address(lightClient);
    }
}

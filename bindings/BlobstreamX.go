// Code generated via scripts/gen_go_bindings.py - DO NOT EDIT.
//
// Go bindings for contracts/src/BlobstreamX.sol (capability parity with the
// reference repo's abigen-generated bindings/BlobstreamX.go).

package bindings

import (
	"math/big"
	"strings"

	ethereum "github.com/ethereum/go-ethereum"
	"github.com/ethereum/go-ethereum/accounts/abi"
	"github.com/ethereum/go-ethereum/accounts/abi/bind"
	"github.com/ethereum/go-ethereum/common"
	"github.com/ethereum/go-ethereum/core/types"
)

// Reference imports to suppress errors if they are not otherwise used.
var (
	_ = big.NewInt
	_ = strings.NewReader
	_ = ethereum.NotFound
	_ = bind.Bind
	_ = common.Big1
	_ = types.BloomLookup
	_ = abi.ConvertType
)

// BlobstreamXInitParameters is an auto generated low-level Go binding around a user-defined struct.
type BlobstreamXInitParameters struct {
	Guardian common.Address
	Gateway common.Address
	Height uint64
	Header [32]byte
	NextHeaderFunctionId [32]byte
	HeaderRangeFunctionId [32]byte
}

// DataRootTuple is an auto generated low-level Go binding around a user-defined struct.
type DataRootTuple struct {
	Height *big.Int
	DataRoot [32]byte
}

// BinaryMerkleProof is an auto generated low-level Go binding around a user-defined struct.
type BinaryMerkleProof struct {
	SideNodes [][32]byte
	Key *big.Int
	NumLeaves *big.Int
}

// BlobstreamXMetaData contains all meta data concerning the BlobstreamX contract.
var BlobstreamXMetaData = &bind.MetaData{
	ABI: "[{\"type\":\"function\",\"name\":\"VERSION\",\"inputs\":[],\"outputs\":[{\"name\":\"\",\"type\":\"string\",\"internalType\":\"string\"}],\"stateMutability\":\"pure\"},{\"type\":\"function\",\"name\":\"DATA_COMMITMENT_MAX\",\"inputs\":[],\"outputs\":[{\"name\":\"\",\"type\":\"uint64\",\"internalType\":\"uint64\"}],\"stateMutability\":\"view\"},{\"type\":\"function\",\"name\":\"initialize\",\"inputs\":[{\"name\":\"p\",\"type\":\"tuple\",\"internalType\":\"struct BlobstreamX.InitParameters\",\"components\":[{\"name\":\"guardian\",\"type\":\"address\",\"internalType\":\"address\"},{\"name\":\"gateway\",\"type\":\"address\",\"internalType\":\"address\"},{\"name\":\"height\",\"type\":\"uint64\",\"internalType\":\"uint64\"},{\"name\":\"header\",\"type\":\"bytes32\",\"internalType\":\"bytes32\"},{\"name\":\"nextHeaderFunctionId\",\"type\":\"bytes32\",\"internalType\":\"bytes32\"},{\"name\":\"headerRangeFunctionId\",\"type\":\"bytes32\",\"internalType\":\"bytes32\"}]}],\"outputs\":[],\"stateMutability\":\"nonpayable\"},{\"type\":\"function\",\"name\":\"gateway\",\"inputs\":[],\"outputs\":[{\"name\":\"\",\"type\":\"address\",\"internalType\":\"address\"}],\"stateMutability\":\"view\"},{\"type\":\"function\",\"name\":\"guardian\",\"inputs\":[],\"outputs\":[{\"name\":\"\",\"type\":\"address\",\"internalType\":\"address\"}],\"stateMutability\":\"view\"},{\"type\":\"function\",\"name\":\"latestBlock\",\"inputs\":[],\"outputs\":[{\"name\":\"\",\"type\":\"uint64\",\"internalType\":\"uint64\"}],\"stateMutability\":\"view\"},{\"type\":\"function\",\"name\":\"state_proofNonce\",\"inputs\":[],\"outputs\":[{\"name\":\"\",\"type\":\"uint256\",\"internalType\":\"uint256\"}],\"stateMutability\":\"view\"},{\"type\":\"function\",\"name\":\"blockHeightToHeaderHash\",\"inputs\":[{\"name\":\"\",\"type\":\"uint64\",\"internalType\":\"uint64\"}],\"outputs\":[{\"name\":\"\",\"type\":\"bytes32\",\"internalType\":\"bytes32\"}],\"stateMutability\":\"view\"},{\"type\":\"function\",\"name\":\"state_dataCommitments\",\"inputs\":[{\"name\":\"\",\"type\":\"uint256\",\"internalType\":\"uint256\"}],\"outputs\":[{\"name\":\"\",\"type\":\"bytes32\",\"internalType\":\"bytes32\"}],\"stateMutability\":\"view\"},{\"type\":\"function\",\"name\":\"headerRangeFunctionId\",\"inputs\":[],\"outputs\":[{\"name\":\"\",\"type\":\"bytes32\",\"internalType\":\"bytes32\"}],\"stateMutability\":\"view\"},{\"type\":\"function\",\"name\":\"nextHeaderFunctionId\",\"inputs\":[],\"outputs\":[{\"name\":\"\",\"type\":\"bytes32\",\"internalType\":\"bytes32\"}],\"stateMutability\":\"view\"},{\"type\":\"function\",\"name\":\"frozen\",\"inputs\":[],\"outputs\":[{\"name\":\"\",\"type\":\"bool\",\"internalType\":\"bool\"}],\"stateMutability\":\"view\"},{\"type\":\"function\",\"name\":\"updateFreeze\",\"inputs\":[{\"name\":\"freeze\",\"type\":\"bool\",\"internalType\":\"bool\"}],\"outputs\":[],\"stateMutability\":\"nonpayable\"},{\"type\":\"function\",\"name\":\"updateGateway\",\"inputs\":[{\"name\":\"newGateway\",\"type\":\"address\",\"internalType\":\"address\"}],\"outputs\":[],\"stateMutability\":\"nonpayable\"},{\"type\":\"function\",\"name\":\"updateFunctionIds\",\"inputs\":[{\"name\":\"newHeaderRangeFunctionId\",\"type\":\"bytes32\",\"internalType\":\"bytes32\"},{\"name\":\"newNextHeaderFunctionId\",\"type\":\"bytes32\",\"internalType\":\"bytes32\"}],\"outputs\":[],\"stateMutability\":\"nonpayable\"},{\"type\":\"function\",\"name\":\"updateGenesisState\",\"inputs\":[{\"name\":\"height\",\"type\":\"uint32\",\"internalType\":\"uint32\"},{\"name\":\"header\",\"type\":\"bytes32\",\"internalType\":\"bytes32\"}],\"outputs\":[],\"stateMutability\":\"nonpayable\"},{\"type\":\"function\",\"name\":\"requestHeaderRange\",\"inputs\":[{\"name\":\"targetBlock\",\"type\":\"uint64\",\"internalType\":\"uint64\"}],\"outputs\":[],\"stateMutability\":\"payable\"},{\"type\":\"function\",\"name\":\"requestNextHeader\",\"inputs\":[],\"outputs\":[],\"stateMutability\":\"payable\"},{\"type\":\"function\",\"name\":\"commitHeaderRange\",\"inputs\":[{\"name\":\"targetBlock\",\"type\":\"uint64\",\"internalType\":\"uint64\"}],\"outputs\":[],\"stateMutability\":\"nonpayable\"},{\"type\":\"function\",\"name\":\"commitNextHeader\",\"inputs\":[{\"name\":\"trustedBlock\",\"type\":\"uint64\",\"internalType\":\"uint64\"}],\"outputs\":[],\"stateMutability\":\"nonpayable\"},{\"type\":\"function\",\"name\":\"verifyAttestation\",\"inputs\":[{\"name\":\"proofNonce\",\"type\":\"uint256\",\"internalType\":\"uint256\"},{\"name\":\"tuple\",\"type\":\"tuple\",\"internalType\":\"struct DataRootTuple\",\"components\":[{\"name\":\"height\",\"type\":\"uint256\",\"internalType\":\"uint256\"},{\"name\":\"dataRoot\",\"type\":\"bytes32\",\"internalType\":\"bytes32\"}]},{\"name\":\"proof\",\"type\":\"tuple\",\"internalType\":\"struct BinaryMerkleProof\",\"components\":[{\"name\":\"sideNodes\",\"type\":\"bytes32[]\",\"internalType\":\"bytes32[]\"},{\"name\":\"key\",\"type\":\"uint256\",\"internalType\":\"uint256\"},{\"name\":\"numLeaves\",\"type\":\"uint256\",\"internalType\":\"uint256\"}]}],\"outputs\":[{\"name\":\"\",\"type\":\"bool\",\"internalType\":\"bool\"}],\"stateMutability\":\"view\"},{\"type\":\"event\",\"name\":\"HeadUpdate\",\"inputs\":[{\"name\":\"blockNumber\",\"type\":\"uint64\",\"indexed\":false,\"internalType\":\"uint64\"},{\"name\":\"headerHash\",\"type\":\"bytes32\",\"indexed\":false,\"internalType\":\"bytes32\"}],\"anonymous\":false},{\"type\":\"event\",\"name\":\"DataCommitmentStored\",\"inputs\":[{\"name\":\"proofNonce\",\"type\":\"uint256\",\"indexed\":false,\"internalType\":\"uint256\"},{\"name\":\"startBlock\",\"type\":\"uint64\",\"indexed\":true,\"internalType\":\"uint64\"},{\"name\":\"endBlock\",\"type\":\"uint64\",\"indexed\":true,\"internalType\":\"uint64\"},{\"name\":\"dataCommitment\",\"type\":\"bytes32\",\"indexed\":true,\"internalType\":\"bytes32\"}],\"anonymous\":false},{\"type\":\"event\",\"name\":\"NextHeaderRequested\",\"inputs\":[{\"name\":\"trustedBlock\",\"type\":\"uint64\",\"indexed\":true,\"internalType\":\"uint64\"},{\"name\":\"trustedHeader\",\"type\":\"bytes32\",\"indexed\":true,\"internalType\":\"bytes32\"}],\"anonymous\":false},{\"type\":\"event\",\"name\":\"HeaderRangeRequested\",\"inputs\":[{\"name\":\"trustedBlock\",\"type\":\"uint64\",\"indexed\":true,\"internalType\":\"uint64\"},{\"name\":\"trustedHeader\",\"type\":\"bytes32\",\"indexed\":true,\"internalType\":\"bytes32\"},{\"name\":\"targetBlock\",\"type\":\"uint64\",\"indexed\":true,\"internalType\":\"uint64\"}],\"anonymous\":false},{\"type\":\"error\",\"name\":\"TrustedHeaderNotFound\",\"inputs\":[]},{\"type\":\"error\",\"name\":\"LatestHeaderNotFound\",\"inputs\":[]},{\"type\":\"error\",\"name\":\"TargetBlockNotInRange\",\"inputs\":[]},{\"type\":\"error\",\"name\":\"ContractFrozen\",\"inputs\":[]},{\"type\":\"error\",\"name\":\"TrustedBlockMismatch\",\"inputs\":[]},{\"type\":\"error\",\"name\":\"DataCommitmentNotFound\",\"inputs\":[]}]",
}

// BlobstreamXABI is the input ABI used to generate the binding from.
var BlobstreamXABI = BlobstreamXMetaData.ABI

// BlobstreamX is an auto generated Go binding around an Ethereum contract.
type BlobstreamX struct {
	BlobstreamXCaller
	BlobstreamXTransactor
	BlobstreamXFilterer
}

// BlobstreamXCaller is an auto generated read-only Go binding around an Ethereum contract.
type BlobstreamXCaller struct {
	contract *bind.BoundContract
}

// BlobstreamXTransactor is an auto generated write-only Go binding around an Ethereum contract.
type BlobstreamXTransactor struct {
	contract *bind.BoundContract
}

// BlobstreamXFilterer is an auto generated log filtering Go binding around an Ethereum contract events.
type BlobstreamXFilterer struct {
	contract *bind.BoundContract
}

// NewBlobstreamX creates a new instance of BlobstreamX, bound to a specific deployed contract.
func NewBlobstreamX(address common.Address, backend bind.ContractBackend) (*BlobstreamX, error) {
	parsed, err := abi.JSON(strings.NewReader(BlobstreamXABI))
	if err != nil {
		return nil, err
	}
	contract := bind.NewBoundContract(address, parsed, backend, backend, backend)
	return &BlobstreamX{
		BlobstreamXCaller{contract: contract},
		BlobstreamXTransactor{contract: contract},
		BlobstreamXFilterer{contract: contract},
	}, nil
}

// VERSION is a free data retrieval call binding the contract method.
//
// Solidity: function VERSION(...) pure returns(string)
func (c *BlobstreamXCaller) VERSION(opts *bind.CallOpts) (string, error) {
	var out []interface{}
	err := c.contract.Call(opts, &out, "VERSION")
	if err != nil {
		return "", err
	}
	out0 := *abi.ConvertType(out[0], new(string)).(*string)
	return out0, err
}

// DATA_COMMITMENT_MAX is a free data retrieval call binding the contract method.
//
// Solidity: function DATA_COMMITMENT_MAX(...) view returns(uint64)
func (c *BlobstreamXCaller) DATA_COMMITMENT_MAX(opts *bind.CallOpts) (uint64, error) {
	var out []interface{}
	err := c.contract.Call(opts, &out, "DATA_COMMITMENT_MAX")
	if err != nil {
		return 0, err
	}
	out0 := *abi.ConvertType(out[0], new(uint64)).(*uint64)
	return out0, err
}

// Gateway is a free data retrieval call binding the contract method.
//
// Solidity: function gateway(...) view returns(address)
func (c *BlobstreamXCaller) Gateway(opts *bind.CallOpts) (common.Address, error) {
	var out []interface{}
	err := c.contract.Call(opts, &out, "gateway")
	if err != nil {
		return *new(common.Address), err
	}
	out0 := *abi.ConvertType(out[0], new(common.Address)).(*common.Address)
	return out0, err
}

// Guardian is a free data retrieval call binding the contract method.
//
// Solidity: function guardian(...) view returns(address)
func (c *BlobstreamXCaller) Guardian(opts *bind.CallOpts) (common.Address, error) {
	var out []interface{}
	err := c.contract.Call(opts, &out, "guardian")
	if err != nil {
		return *new(common.Address), err
	}
	out0 := *abi.ConvertType(out[0], new(common.Address)).(*common.Address)
	return out0, err
}

// LatestBlock is a free data retrieval call binding the contract method.
//
// Solidity: function latestBlock(...) view returns(uint64)
func (c *BlobstreamXCaller) LatestBlock(opts *bind.CallOpts) (uint64, error) {
	var out []interface{}
	err := c.contract.Call(opts, &out, "latestBlock")
	if err != nil {
		return 0, err
	}
	out0 := *abi.ConvertType(out[0], new(uint64)).(*uint64)
	return out0, err
}

// State_proofNonce is a free data retrieval call binding the contract method.
//
// Solidity: function state_proofNonce(...) view returns(uint256)
func (c *BlobstreamXCaller) State_proofNonce(opts *bind.CallOpts) (*big.Int, error) {
	var out []interface{}
	err := c.contract.Call(opts, &out, "state_proofNonce")
	if err != nil {
		return *new(*big.Int), err
	}
	out0 := *abi.ConvertType(out[0], new(*big.Int)).(**big.Int)
	return out0, err
}

// BlockHeightToHeaderHash is a free data retrieval call binding the contract method.
//
// Solidity: function blockHeightToHeaderHash(...) view returns(bytes32)
func (c *BlobstreamXCaller) BlockHeightToHeaderHash(opts *bind.CallOpts, arg0 uint64) ([32]byte, error) {
	var out []interface{}
	err := c.contract.Call(opts, &out, "blockHeightToHeaderHash", arg0)
	if err != nil {
		return *new([32]byte), err
	}
	out0 := *abi.ConvertType(out[0], new([32]byte)).(*[32]byte)
	return out0, err
}

// State_dataCommitments is a free data retrieval call binding the contract method.
//
// Solidity: function state_dataCommitments(...) view returns(bytes32)
func (c *BlobstreamXCaller) State_dataCommitments(opts *bind.CallOpts, arg0 *big.Int) ([32]byte, error) {
	var out []interface{}
	err := c.contract.Call(opts, &out, "state_dataCommitments", arg0)
	if err != nil {
		return *new([32]byte), err
	}
	out0 := *abi.ConvertType(out[0], new([32]byte)).(*[32]byte)
	return out0, err
}

// HeaderRangeFunctionId is a free data retrieval call binding the contract method.
//
// Solidity: function headerRangeFunctionId(...) view returns(bytes32)
func (c *BlobstreamXCaller) HeaderRangeFunctionId(opts *bind.CallOpts) ([32]byte, error) {
	var out []interface{}
	err := c.contract.Call(opts, &out, "headerRangeFunctionId")
	if err != nil {
		return *new([32]byte), err
	}
	out0 := *abi.ConvertType(out[0], new([32]byte)).(*[32]byte)
	return out0, err
}

// NextHeaderFunctionId is a free data retrieval call binding the contract method.
//
// Solidity: function nextHeaderFunctionId(...) view returns(bytes32)
func (c *BlobstreamXCaller) NextHeaderFunctionId(opts *bind.CallOpts) ([32]byte, error) {
	var out []interface{}
	err := c.contract.Call(opts, &out, "nextHeaderFunctionId")
	if err != nil {
		return *new([32]byte), err
	}
	out0 := *abi.ConvertType(out[0], new([32]byte)).(*[32]byte)
	return out0, err
}

// Frozen is a free data retrieval call binding the contract method.
//
// Solidity: function frozen(...) view returns(bool)
func (c *BlobstreamXCaller) Frozen(opts *bind.CallOpts) (bool, error) {
	var out []interface{}
	err := c.contract.Call(opts, &out, "frozen")
	if err != nil {
		return false, err
	}
	out0 := *abi.ConvertType(out[0], new(bool)).(*bool)
	return out0, err
}

// VerifyAttestation is a free data retrieval call binding the contract method.
//
// Solidity: function verifyAttestation(...) view returns(bool)
func (c *BlobstreamXCaller) VerifyAttestation(opts *bind.CallOpts, proofNonce *big.Int, tuple DataRootTuple, proof BinaryMerkleProof) (bool, error) {
	var out []interface{}
	err := c.contract.Call(opts, &out, "verifyAttestation", proofNonce, tuple, proof)
	if err != nil {
		return false, err
	}
	out0 := *abi.ConvertType(out[0], new(bool)).(*bool)
	return out0, err
}

// Initialize is a paid mutator transaction binding the contract method.
//
// Solidity: function initialize(...) nonpayable
func (t *BlobstreamXTransactor) Initialize(opts *bind.TransactOpts, p BlobstreamXInitParameters) (*types.Transaction, error) {
	return t.contract.Transact(opts, "initialize", p)
}

// UpdateFreeze is a paid mutator transaction binding the contract method.
//
// Solidity: function updateFreeze(...) nonpayable
func (t *BlobstreamXTransactor) UpdateFreeze(opts *bind.TransactOpts, freeze bool) (*types.Transaction, error) {
	return t.contract.Transact(opts, "updateFreeze", freeze)
}

// UpdateGateway is a paid mutator transaction binding the contract method.
//
// Solidity: function updateGateway(...) nonpayable
func (t *BlobstreamXTransactor) UpdateGateway(opts *bind.TransactOpts, newGateway common.Address) (*types.Transaction, error) {
	return t.contract.Transact(opts, "updateGateway", newGateway)
}

// UpdateFunctionIds is a paid mutator transaction binding the contract method.
//
// Solidity: function updateFunctionIds(...) nonpayable
func (t *BlobstreamXTransactor) UpdateFunctionIds(opts *bind.TransactOpts, newHeaderRangeFunctionId [32]byte, newNextHeaderFunctionId [32]byte) (*types.Transaction, error) {
	return t.contract.Transact(opts, "updateFunctionIds", newHeaderRangeFunctionId, newNextHeaderFunctionId)
}

// UpdateGenesisState is a paid mutator transaction binding the contract method.
//
// Solidity: function updateGenesisState(...) nonpayable
func (t *BlobstreamXTransactor) UpdateGenesisState(opts *bind.TransactOpts, height uint32, header [32]byte) (*types.Transaction, error) {
	return t.contract.Transact(opts, "updateGenesisState", height, header)
}

// RequestHeaderRange is a paid mutator transaction binding the contract method.
//
// Solidity: function requestHeaderRange(...) payable
func (t *BlobstreamXTransactor) RequestHeaderRange(opts *bind.TransactOpts, targetBlock uint64) (*types.Transaction, error) {
	return t.contract.Transact(opts, "requestHeaderRange", targetBlock)
}

// RequestNextHeader is a paid mutator transaction binding the contract method.
//
// Solidity: function requestNextHeader(...) payable
func (t *BlobstreamXTransactor) RequestNextHeader(opts *bind.TransactOpts) (*types.Transaction, error) {
	return t.contract.Transact(opts, "requestNextHeader")
}

// CommitHeaderRange is a paid mutator transaction binding the contract method.
//
// Solidity: function commitHeaderRange(...) nonpayable
func (t *BlobstreamXTransactor) CommitHeaderRange(opts *bind.TransactOpts, targetBlock uint64) (*types.Transaction, error) {
	return t.contract.Transact(opts, "commitHeaderRange", targetBlock)
}

// CommitNextHeader is a paid mutator transaction binding the contract method.
//
// Solidity: function commitNextHeader(...) nonpayable
func (t *BlobstreamXTransactor) CommitNextHeader(opts *bind.TransactOpts, trustedBlock uint64) (*types.Transaction, error) {
	return t.contract.Transact(opts, "commitNextHeader", trustedBlock)
}

// BlobstreamXHeadUpdate represents a HeadUpdate event raised by the BlobstreamX contract.
type BlobstreamXHeadUpdate struct {
	BlockNumber uint64
	HeaderHash [32]byte
	Raw types.Log // Blockchain specific contextual infos
}

// ParseHeadUpdate is a log parse operation binding the contract event.
func (f *BlobstreamXFilterer) ParseHeadUpdate(log types.Log) (*BlobstreamXHeadUpdate, error) {
	event := new(BlobstreamXHeadUpdate)
	if err := f.contract.UnpackLog(event, "HeadUpdate", log); err != nil {
		return nil, err
	}
	event.Raw = log
	return event, nil
}

// BlobstreamXDataCommitmentStored represents a DataCommitmentStored event raised by the BlobstreamX contract.
type BlobstreamXDataCommitmentStored struct {
	ProofNonce *big.Int
	StartBlock uint64
	EndBlock uint64
	DataCommitment [32]byte
	Raw types.Log // Blockchain specific contextual infos
}

// ParseDataCommitmentStored is a log parse operation binding the contract event.
func (f *BlobstreamXFilterer) ParseDataCommitmentStored(log types.Log) (*BlobstreamXDataCommitmentStored, error) {
	event := new(BlobstreamXDataCommitmentStored)
	if err := f.contract.UnpackLog(event, "DataCommitmentStored", log); err != nil {
		return nil, err
	}
	event.Raw = log
	return event, nil
}

// BlobstreamXNextHeaderRequested represents a NextHeaderRequested event raised by the BlobstreamX contract.
type BlobstreamXNextHeaderRequested struct {
	TrustedBlock uint64
	TrustedHeader [32]byte
	Raw types.Log // Blockchain specific contextual infos
}

// ParseNextHeaderRequested is a log parse operation binding the contract event.
func (f *BlobstreamXFilterer) ParseNextHeaderRequested(log types.Log) (*BlobstreamXNextHeaderRequested, error) {
	event := new(BlobstreamXNextHeaderRequested)
	if err := f.contract.UnpackLog(event, "NextHeaderRequested", log); err != nil {
		return nil, err
	}
	event.Raw = log
	return event, nil
}

// BlobstreamXHeaderRangeRequested represents a HeaderRangeRequested event raised by the BlobstreamX contract.
type BlobstreamXHeaderRangeRequested struct {
	TrustedBlock uint64
	TrustedHeader [32]byte
	TargetBlock uint64
	Raw types.Log // Blockchain specific contextual infos
}

// ParseHeaderRangeRequested is a log parse operation binding the contract event.
func (f *BlobstreamXFilterer) ParseHeaderRangeRequested(log types.Log) (*BlobstreamXHeaderRangeRequested, error) {
	event := new(BlobstreamXHeaderRangeRequested)
	if err := f.contract.UnpackLog(event, "HeaderRangeRequested", log); err != nil {
		return nil, err
	}
	event.Raw = log
	return event, nil
}

"""Ethereum transaction path for the operator/relayer (R12 — reference
bin/local_relay.rs:60-80 and the ethers tx submission in
bin/blobstreamx.rs:94-99,240-296).

Self-contained (stdlib-only) implementation of everything needed to turn
"commit calldata" into a signed raw transaction an Ethereum node accepts:

  * keccak-256 (the original Keccak padding, NOT SHA-3),
  * RLP encoding/decoding,
  * secp256k1 ECDSA with deterministic RFC-6979 nonces,
  * EIP-155 legacy transaction signing, decoding, and sender recovery,
  * a minimal JSON-RPC client with an injectable transport (tests use a
    mock; production points it at an HTTP endpoint).

No network is required to unit-test encoding: `decode_raw_tx` +
`recover_sender` round-trip the signed bytes.
"""

from __future__ import annotations

import json
import hashlib
import hmac
from dataclasses import dataclass
from typing import List, Optional, Tuple, Union

# ---------------------------------------------------------------------------
# keccak-256
# ---------------------------------------------------------------------------

_KECCAK_ROUNDS = 24
_RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]
_ROT = [
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
]
_MASK = (1 << 64) - 1


def _rotl(x: int, n: int) -> int:
    n %= 64
    return ((x << n) | (x >> (64 - n))) & _MASK


def _keccak_f(a: List[List[int]]) -> None:
    for rnd in range(_KECCAK_ROUNDS):
        # theta
        c = [a[x][0] ^ a[x][1] ^ a[x][2] ^ a[x][3] ^ a[x][4]
             for x in range(5)]
        d = [c[(x - 1) % 5] ^ _rotl(c[(x + 1) % 5], 1) for x in range(5)]
        for x in range(5):
            for y in range(5):
                a[x][y] ^= d[x]
        # rho + pi
        b = [[0] * 5 for _ in range(5)]
        for x in range(5):
            for y in range(5):
                b[y][(2 * x + 3 * y) % 5] = _rotl(a[x][y], _ROT[x][y])
        # chi
        for x in range(5):
            for y in range(5):
                a[x][y] = b[x][y] ^ ((~b[(x + 1) % 5][y]) & b[(x + 2) % 5][y])
        # iota
        a[0][0] ^= _RC[rnd]


def keccak256(data: bytes) -> bytes:
    rate = 136  # 1088-bit rate for 256-bit output
    a = [[0] * 5 for _ in range(5)]
    # pad: Keccak (pre-SHA3) multi-rate padding 0x01 ... 0x80
    padded = bytearray(data)
    pad_len = rate - (len(padded) % rate)
    padded += b"\x01" + b"\x00" * (pad_len - 2) + b"\x80" if pad_len >= 2 \
        else b"\x81"
    for off in range(0, len(padded), rate):
        block = padded[off:off + rate]
        for i in range(rate // 8):
            lane = int.from_bytes(block[8 * i:8 * i + 8], "little")
            a[i % 5][i // 5] ^= lane
        _keccak_f(a)
    out = bytearray()
    for i in range(4):  # 32 bytes = 4 lanes
        out += a[i % 5][i // 5].to_bytes(8, "little")
    return bytes(out)


# ---------------------------------------------------------------------------
# RLP
# ---------------------------------------------------------------------------

RlpItem = Union[bytes, List["RlpItem"]]


def rlp_encode(item: RlpItem) -> bytes:
    if isinstance(item, (bytes, bytearray)):
        b = bytes(item)
        if len(b) == 1 and b[0] < 0x80:
            return b
        return _rlp_len(len(b), 0x80) + b
    payload = b"".join(rlp_encode(x) for x in item)
    return _rlp_len(len(payload), 0xC0) + payload


def _rlp_len(n: int, offset: int) -> bytes:
    if n < 56:
        return bytes([offset + n])
    nb = n.to_bytes((n.bit_length() + 7) // 8, "big")
    return bytes([offset + 55 + len(nb)]) + nb


def rlp_decode(data: bytes) -> RlpItem:
    item, rest = _rlp_decode_one(data)
    if rest:
        raise ValueError("trailing RLP bytes")
    return item


def _rlp_decode_one(data: bytes) -> Tuple[RlpItem, bytes]:
    if not data:
        raise ValueError("empty RLP")
    b0 = data[0]
    if b0 < 0x80:
        return data[:1], data[1:]
    if b0 < 0xB8:
        ln = b0 - 0x80
        if ln == 1 and data[1] < 0x80:
            raise ValueError("non-canonical single byte")
        return data[1:1 + ln], data[1 + ln:]
    if b0 < 0xC0:
        lnln = b0 - 0xB7
        ln = int.from_bytes(data[1:1 + lnln], "big")
        if ln < 56:
            raise ValueError("non-canonical length")
        start = 1 + lnln
        return data[start:start + ln], data[start + ln:]
    if b0 < 0xF8:
        ln = b0 - 0xC0
        payload, rest = data[1:1 + ln], data[1 + ln:]
    else:
        lnln = b0 - 0xF7
        ln = int.from_bytes(data[1:1 + lnln], "big")
        if ln < 56:
            raise ValueError("non-canonical length")
        payload, rest = data[1 + lnln:1 + lnln + ln], data[1 + lnln + ln:]
    items = []
    while payload:
        item, payload = _rlp_decode_one(payload)
        items.append(item)
    return items, rest


def _int_bytes(v: int) -> bytes:
    """Minimal big-endian encoding (RLP integer convention: no leading
    zeros, zero encodes as empty)."""
    if v == 0:
        return b""
    return v.to_bytes((v.bit_length() + 7) // 8, "big")


def _bytes_int(b: bytes) -> int:
    return int.from_bytes(b, "big") if b else 0


# ---------------------------------------------------------------------------
# secp256k1
# ---------------------------------------------------------------------------

_P = 2**256 - 2**32 - 977
_N = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6AF48A03BBFD25E8CD0364141
_GX = 0x79BE667EF9DCBBAC55A06295CE870B07029BFCDB2DCE28D959F2815B16F81798
_GY = 0x483ADA7726A3C4655DA4FBFC0E1108A8FD17B448A68554199C47D08FFB10D4B8


def _inv(a: int, m: int) -> int:
    return pow(a, m - 2, m)


def _pt_add(p, q):
    if p is None:
        return q
    if q is None:
        return p
    (x1, y1), (x2, y2) = p, q
    if x1 == x2:
        if (y1 + y2) % _P == 0:
            return None
        lam = (3 * x1 * x1) * _inv(2 * y1, _P) % _P
    else:
        lam = (y2 - y1) * _inv(x2 - x1, _P) % _P
    x3 = (lam * lam - x1 - x2) % _P
    y3 = (lam * (x1 - x3) - y1) % _P
    return (x3, y3)


def _pt_mul(k: int, p) -> Optional[tuple]:
    acc = None
    while k:
        if k & 1:
            acc = _pt_add(acc, p)
        p = _pt_add(p, p)
        k >>= 1
    return acc


def privkey_to_pubkey(priv: bytes) -> Tuple[int, int]:
    d = int.from_bytes(priv, "big")
    assert 1 <= d < _N, "invalid private key"
    return _pt_mul(d, (_GX, _GY))


def pubkey_to_address(pub: Tuple[int, int]) -> bytes:
    raw = pub[0].to_bytes(32, "big") + pub[1].to_bytes(32, "big")
    return keccak256(raw)[12:]


def privkey_to_address(priv: bytes) -> bytes:
    return pubkey_to_address(privkey_to_pubkey(priv))


def _rfc6979_k(msg_hash: bytes, priv: bytes) -> int:
    """Deterministic nonce (RFC 6979, HMAC-SHA256)."""
    h1 = msg_hash
    v = b"\x01" * 32
    k = b"\x00" * 32
    k = hmac.new(k, v + b"\x00" + priv + h1, hashlib.sha256).digest()
    v = hmac.new(k, v, hashlib.sha256).digest()
    k = hmac.new(k, v + b"\x01" + priv + h1, hashlib.sha256).digest()
    v = hmac.new(k, v, hashlib.sha256).digest()
    while True:
        v = hmac.new(k, v, hashlib.sha256).digest()
        cand = int.from_bytes(v, "big")
        if 1 <= cand < _N:
            return cand
        k = hmac.new(k, v + b"\x00", hashlib.sha256).digest()
        v = hmac.new(k, v, hashlib.sha256).digest()


def ecdsa_sign(msg_hash: bytes, priv: bytes) -> Tuple[int, int, int]:
    """Returns (r, s, y_parity) with low-s normalization (EIP-2)."""
    z = int.from_bytes(msg_hash, "big")
    d = int.from_bytes(priv, "big")
    while True:
        k = _rfc6979_k(msg_hash, priv)
        pt = _pt_mul(k, (_GX, _GY))
        r = pt[0] % _N
        if r == 0:
            msg_hash = hashlib.sha256(msg_hash).digest()
            continue
        s = _inv(k, _N) * (z + r * d) % _N
        if s == 0:
            msg_hash = hashlib.sha256(msg_hash).digest()
            continue
        y_parity = pt[1] & 1
        if s > _N // 2:
            s = _N - s
            y_parity ^= 1
        return r, s, y_parity


def ecdsa_recover(msg_hash: bytes, r: int, s: int,
                  y_parity: int) -> Tuple[int, int]:
    """Recover the public key from a signature."""
    assert 1 <= r < _N and 1 <= s < _N
    x = r
    y_sq = (pow(x, 3, _P) + 7) % _P
    y = pow(y_sq, (_P + 1) // 4, _P)
    if pow(y, 2, _P) != y_sq:
        raise ValueError("invalid signature: r not on curve")
    if y & 1 != y_parity:
        y = _P - y
    z = int.from_bytes(msg_hash, "big")
    r_inv = _inv(r, _N)
    # Q = r^-1 (s*R - z*G)
    srp = _pt_mul(s, (x, y))
    zg = _pt_mul(z % _N, (_GX, _GY))
    neg_zg = (zg[0], (-zg[1]) % _P)
    q = _pt_mul(r_inv, _pt_add(srp, neg_zg))
    if q is None:
        raise ValueError("invalid signature: point at infinity")
    return q


# ---------------------------------------------------------------------------
# EIP-155 legacy transaction
# ---------------------------------------------------------------------------

@dataclass
class Transaction:
    nonce: int
    gas_price: int
    gas_limit: int
    to: bytes  # 20 bytes (empty for create)
    value: int
    data: bytes
    chain_id: int
    v: Optional[int] = None
    r: Optional[int] = None
    s: Optional[int] = None

    def signing_hash(self) -> bytes:
        """EIP-155: hash of rlp([nonce, gasprice, gas, to, value, data,
        chain_id, 0, 0])."""
        payload = [
            _int_bytes(self.nonce), _int_bytes(self.gas_price),
            _int_bytes(self.gas_limit), self.to, _int_bytes(self.value),
            self.data, _int_bytes(self.chain_id), b"", b"",
        ]
        return keccak256(rlp_encode(payload))

    def raw(self) -> bytes:
        assert self.v is not None, "unsigned"
        payload = [
            _int_bytes(self.nonce), _int_bytes(self.gas_price),
            _int_bytes(self.gas_limit), self.to, _int_bytes(self.value),
            self.data, _int_bytes(self.v), _int_bytes(self.r),
            _int_bytes(self.s),
        ]
        return rlp_encode(payload)

    def tx_hash(self) -> bytes:
        return keccak256(self.raw())


def sign_tx(tx: Transaction, priv: bytes) -> Transaction:
    r, s, y_parity = ecdsa_sign(tx.signing_hash(), priv)
    tx.v = 35 + 2 * tx.chain_id + y_parity
    tx.r, tx.s = r, s
    return tx


def decode_raw_tx(raw: bytes) -> Transaction:
    items = rlp_decode(raw)
    if not isinstance(items, list) or len(items) != 9:
        raise ValueError("not a legacy transaction")
    nonce, gas_price, gas_limit, to, value, data, v, r, s = items
    v_i = _bytes_int(v)
    if v_i >= 35:
        chain_id = (v_i - 35) // 2
    elif v_i in (27, 28):
        chain_id = 0  # pre-155
    else:
        raise ValueError("bad v")
    return Transaction(
        nonce=_bytes_int(nonce), gas_price=_bytes_int(gas_price),
        gas_limit=_bytes_int(gas_limit), to=bytes(to),
        value=_bytes_int(value), data=bytes(data), chain_id=chain_id,
        v=v_i, r=_bytes_int(r), s=_bytes_int(s),
    )


def recover_sender(tx: Transaction) -> bytes:
    if tx.v >= 35:
        y_parity = (tx.v - 35) % 2
    else:
        y_parity = tx.v - 27
    pub = ecdsa_recover(tx.signing_hash(), tx.r, tx.s, y_parity)
    return pubkey_to_address(pub)


# ---------------------------------------------------------------------------
# minimal JSON-RPC client
# ---------------------------------------------------------------------------

class EthRpcClient:
    """JSON-RPC over an injectable transport: transport(payload_dict) ->
    result. Production wires an HTTP POST; tests use MockEthNode.call."""

    def __init__(self, transport):
        self.transport = transport
        self._id = 0

    def _call(self, method: str, params: list):
        self._id += 1
        resp = self.transport({
            "jsonrpc": "2.0", "id": self._id,
            "method": method, "params": params,
        })
        if "error" in resp and resp["error"]:
            raise RuntimeError(f"rpc error: {resp['error']}")
        return resp["result"]

    def get_transaction_count(self, address: bytes) -> int:
        out = self._call("eth_getTransactionCount",
                         ["0x" + address.hex(), "pending"])
        return int(out, 16)

    def gas_price(self) -> int:
        return int(self._call("eth_gasPrice", []), 16)

    def send_raw_transaction(self, raw: bytes) -> bytes:
        out = self._call("eth_sendRawTransaction", ["0x" + raw.hex()])
        return bytes.fromhex(out[2:])

    def get_transaction_receipt(self, tx_hash: bytes) -> Optional[dict]:
        return self._call("eth_getTransactionReceipt",
                          ["0x" + tx_hash.hex()])


class MockEthNode:
    """In-memory Ethereum node for operator/relayer tests: accepts raw
    transactions, validates signature + nonce, records them."""

    def __init__(self, chain_id: int = 11155111, gas_price: int = 10**9):
        self.chain_id = chain_id
        self._gas_price = gas_price
        self.nonces = {}
        self.transactions = []  # (sender, Transaction)

    def call(self, payload: dict) -> dict:
        method, params = payload["method"], payload["params"]
        try:
            result = self._dispatch(method, params)
            return {"jsonrpc": "2.0", "id": payload["id"], "result": result}
        except Exception as e:
            return {"jsonrpc": "2.0", "id": payload["id"],
                    "error": {"code": -32000, "message": str(e)}}

    def _dispatch(self, method, params):
        if method == "eth_gasPrice":
            return hex(self._gas_price)
        if method == "eth_getTransactionCount":
            addr = params[0].lower()
            return hex(self.nonces.get(addr, 0))
        if method == "eth_sendRawTransaction":
            raw = bytes.fromhex(params[0][2:])
            tx = decode_raw_tx(raw)
            if tx.chain_id != self.chain_id:
                raise ValueError(
                    f"wrong chain id {tx.chain_id} != {self.chain_id}")
            sender = recover_sender(tx)
            addr = "0x" + sender.hex()
            expected = self.nonces.get(addr, 0)
            if tx.nonce != expected:
                raise ValueError(f"bad nonce {tx.nonce} != {expected}")
            self.nonces[addr] = expected + 1
            self.transactions.append((sender, tx))
            return "0x" + tx.tx_hash().hex()
        if method == "eth_getTransactionReceipt":
            want = params[0][2:]
            for sender, tx in self.transactions:
                if tx.tx_hash().hex() == want:
                    return {"status": "0x1",
                            "transactionHash": params[0],
                            "from": "0x" + sender.hex(),
                            "to": "0x" + tx.to.hex()}
            return None
        raise ValueError(f"unsupported method {method}")


# ---------------------------------------------------------------------------
# relayer
# ---------------------------------------------------------------------------

# function selectors of the light client's commit methods
# (contracts/src/BlobstreamX.sol; reference commitHeaderRange/commitNextHeader)
def _selector(sig: str) -> bytes:
    return keccak256(sig.encode())[:4]


SEL_COMMIT_HEADER_RANGE = _selector("commitHeaderRange(uint64)")
SEL_COMMIT_NEXT_HEADER = _selector("commitNextHeader(uint64)")


def commit_calldata(selector: bytes, block: int) -> bytes:
    return selector + block.to_bytes(32, "big")


class LocalRelayer:
    """Sign-and-submit relayer (reference bin/local_relay.rs:60-80): builds
    the commit transaction, signs it with the operator key, and submits via
    JSON-RPC, returning the receipt."""

    def __init__(self, client: EthRpcClient, priv: bytes,
                 contract_address: bytes, chain_id: int,
                 gas_limit: int = 500_000):
        self.client = client
        self.priv = priv
        self.address = privkey_to_address(priv)
        self.contract = contract_address
        self.chain_id = chain_id
        self.gas_limit = gas_limit  # reference relay cap, BlobstreamX.sol:124

    def relay(self, calldata: bytes) -> dict:
        nonce = self.client.get_transaction_count(self.address)
        tx = Transaction(
            nonce=nonce, gas_price=self.client.gas_price(),
            gas_limit=self.gas_limit, to=self.contract, value=0,
            data=calldata, chain_id=self.chain_id,
        )
        sign_tx(tx, self.priv)
        tx_hash = self.client.send_raw_transaction(tx.raw())
        receipt = self.client.get_transaction_receipt(tx_hash)
        return {"tx_hash": "0x" + tx_hash.hex(), "receipt": receipt,
                "raw": "0x" + tx.raw().hex()}

"""Pallas SHA-256 kernel vs hashlib (interpret mode on CPU)."""

import hashlib

import numpy as np
import pytest

from blobstreamx_tpu.ops.pallas import sha256 as psha

pytestmark = pytest.mark.proof  # pallas-interpret on CPU: minutes per case


def _check(B, L, seed):
    rng = np.random.default_rng(seed)
    msgs = rng.integers(0, 256, size=(B, L), dtype=np.uint8)
    got = psha.sha256_fixed_len(msgs, interpret=True)
    for i in range(0, B, max(1, B // 7)):  # spot-check across the batch
        assert bytes(got[i]) == hashlib.sha256(bytes(msgs[i])).digest()
    # edges (padding wrap, tile boundary)
    assert bytes(got[0]) == hashlib.sha256(bytes(msgs[0])).digest()
    assert bytes(got[B - 1]) == hashlib.sha256(bytes(msgs[B - 1])).digest()


def test_single_block_64b_leaves():
    # 64-byte data-root tuple leaves: pad to 2 blocks
    _check(B=300, L=64, seed=1)


def test_one_block_exact_pad():
    # 55 bytes: pad fits in one block
    _check(B=130, L=55, seed=2)


def test_multi_block():
    # 3-block messages (inner-node preimages are 65 bytes; use 150)
    _check(B=64, L=150, seed=3)


def test_tile_padding_large():
    # batch > one 1024-tile to exercise the grid
    _check(B=1100, L=64, seed=4)

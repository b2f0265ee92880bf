"""FRI low-degree proofs over GF(p^2) — batched folds on device, host transcript.

Capability parity with the reference prover's FRI stage (SURVEY.md D5:
folding, query rounds, PoW grinding). Arity-2 folds are vectorized over the
whole layer (one fused jnp expression per fold); Merkle layer commitments
reuse proof/merkle_cap.py's batched Poseidon trees. Verification is
host-side python-int math (it is cheap and must replay the transcript).

Domain convention: values live on the coset ``shift * K`` of the order-N
subgroup K in natural order (x_i = shift * w^i), so -x_i sits at index
i + N/2 and a fold halves the domain in place.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from ..field import goldilocks as gl
from ..field import ntt as nttmod
from ..field import extension as ext
from . import merkle_cap
from .transcript import Transcript

INV2 = pow(2, gl.P - 2, gl.P)


@dataclass
class FriConfig:
    rate_bits: int = 3
    cap_height: int = 2
    num_query_rounds: int = 28
    pow_bits: int = 8
    final_poly_bits: int = 3  # stop folding at domain size 2^final_poly_bits


@dataclass
class FriQueryStep:
    pair_values: np.ndarray  # (2, 2, 2): [v(x), v(-x)] extension values
    siblings: List[np.ndarray]


@dataclass
class FriProof:
    caps: List[list]
    final_coeffs: List[Tuple[int, int]]
    pow_nonce: int
    query_rounds: List[List[FriQueryStep]]


@functools.lru_cache(maxsize=None)
def _layer_domain(log_n: int, log_layer: int) -> tuple:
    """(shift, w, inv_x powers) for the layer with domain size 2^(log_n - log_layer)."""
    n = 1 << (log_n - log_layer)
    shift = pow(gl.GENERATOR, 1 << log_layer, gl.P)
    w = gl.primitive_root_of_unity(log_n - log_layer)
    half = n // 2
    w_inv = pow(w, gl.P - 2, gl.P)
    s_inv = pow(shift, gl.P - 2, gl.P)
    invs = np.empty(half, dtype=np.uint64)
    acc = s_inv
    for i in range(half):
        invs[i] = acc
        acc = (acc * w_inv) % gl.P
    return shift, w, invs


def _fold(values: jnp.ndarray, beta, log_n: int, log_layer: int) -> jnp.ndarray:
    """One arity-2 fold: (n, 2, 2) -> (n/2, 2, 2).

    v'(x^2) = (v(x) + v(-x))/2 + beta * (v(x) - v(-x)) / (2x)
    """
    n = values.shape[0]
    half = n // 2
    _, _, invs = _layer_domain(log_n, log_layer)
    inv_x = gl.from_int(invs)  # (half, 2)
    a, b = values[:half], values[half:]
    s_plus = ext.add(a, b)
    s_minus = ext.sub(a, b)
    beta_arr = jnp.broadcast_to(ext.from_int_pair(beta[0], beta[1]), (half, 2, 2))
    term = ext.mul(ext.scalar_mul(s_minus, inv_x), beta_arr)
    folded = ext.add(s_plus, term)
    inv2 = jnp.broadcast_to(gl.from_int(INV2), (half, 2))
    return ext.scalar_mul(folded, inv2)


def _pair_leaves(values: jnp.ndarray) -> jnp.ndarray:
    """(n, 2, 2) ext values -> (n/2, 4, 2) leaf rows [v(x)||v(-x)]."""
    n = values.shape[0]
    half = n // 2
    return jnp.concatenate([values[:half], values[half:]], axis=-2)


def _coset_intt_ext(values: jnp.ndarray, shift: int) -> List[Tuple[int, int]]:
    """Ext evals on shift*K -> list of ext coefficients (python ints)."""
    n = values.shape[0]
    base = jnp.moveaxis(values, -2, 0)  # (2, n, 2)
    coeffs = nttmod.ntt(base, inverse=True)
    s_inv = pow(shift, gl.P - 2, gl.P)
    pows = np.empty(n, dtype=np.uint64)
    acc = 1
    for i in range(n):
        pows[i] = acc
        acc = (acc * s_inv) % gl.P
    coeffs = gl.mul(coeffs, gl.from_int(pows))
    c = gl.to_int(np.asarray(coeffs))
    return [(int(c[0, i]), int(c[1, i])) for i in range(n)]


def grind(transcript: Transcript, pow_bits: int) -> int:
    """Proof-of-work: first nonce whose challenge has pow_bits leading
    zeros. The whole search loop runs in the native kernel when built
    (blobstreamx_tpu/native — 2^pow_bits expected permutations)."""
    from ..ops import poseidon as pos

    native = pos._get_native()
    if native:
        return native.grind(transcript.state, transcript.input_buffer,
                            pow_bits)
    nonce = 0
    while True:
        t = transcript.fork()
        t.observe_element(nonce)
        if t.get_challenge() >> (64 - pow_bits) == 0:
            return nonce
        nonce += 1


def check_grind(transcript: Transcript, nonce: int, pow_bits: int) -> bool:
    t = transcript.fork()
    t.observe_element(nonce)
    return t.get_challenge() >> (64 - pow_bits) == 0


def fri_prove(values: jnp.ndarray, transcript: Transcript, cfg: FriConfig):
    """Prove that `values` (N, 2, 2) on coset g*K has degree < N >> rate_bits.

    Returns (FriProof, query_indices) — callers open their outer oracles at
    the same indices."""
    N = values.shape[0]
    log_n = N.bit_length() - 1
    assert 1 << log_n == N

    from ..parallel import mesh as pmesh

    mesh = pmesh.active_mesh()

    trees: List[merkle_cap.MerkleTree] = []
    leaves_np: List[np.ndarray] = []
    cur = values
    log_layer = 0
    # shard only layers big enough to amortize a shard_map program (the
    # tail layers are tiny; a dense fold there is faster than any
    # distribution — and on virtual-device CPU meshes each extra shape
    # costs a full compile)
    _SHARD_MIN = 128

    while cur.shape[0] > (1 << cfg.final_poly_bits):
        leaves = _pair_leaves(cur)
        cap_k = min(cfg.cap_height, (leaves.shape[0].bit_length() - 1))
        if (mesh is not None and leaves.shape[0] >= _SHARD_MIN
                and leaves.shape[0] % np.array(mesh.devices).size == 0):
            digests = pmesh.sharded_leaf_digests(leaves, mesh)
            tree = merkle_cap.build_tree_from_digests(digests, cap_k)
        else:
            tree = merkle_cap.build_tree(leaves, cap_k)
        transcript.observe_cap(tree.cap_ints())
        beta = transcript.get_extension_challenge()
        trees.append(tree)
        leaves_np.append(np.asarray(leaves))
        half = cur.shape[0] // 2
        if mesh is not None and half >= _SHARD_MIN:
            _, _, invs = _layer_domain(log_n, log_layer)
            cur = pmesh.sharded_fold(cur[:half], cur[half:],
                                     gl.from_int(invs), beta, mesh)
        else:
            cur = _fold(cur, beta, log_n, log_layer)
        log_layer += 1

    final_shift = pow(gl.GENERATOR, 1 << log_layer, gl.P)
    final_size = cur.shape[0]
    final_len = max(1, final_size >> cfg.rate_bits)
    all_coeffs = _coset_intt_ext(cur, final_shift)
    final_coeffs = all_coeffs[:final_len]
    # NOTE: for an honest prover the truncated tail is zero; soundness comes
    # from the verifier evaluating only the truncated polynomial.
    for c in final_coeffs:
        transcript.observe_extension(c)

    nonce = grind(transcript, cfg.pow_bits)
    transcript.observe_element(nonce)
    indices = transcript.get_indices(cfg.num_query_rounds, log_n)

    query_rounds = []
    for q in indices:
        steps = []
        n = N
        idx = q
        for k, tree in enumerate(trees):
            half = n // 2
            p = idx % half
            row = leaves_np[k][p]  # (4, 2)
            steps.append(
                FriQueryStep(
                    pair_values=row.reshape(2, 2, 2),
                    siblings=tree.open(p),
                )
            )
            idx = p
            n = half
        query_rounds.append(steps)

    proof = FriProof(
        caps=[t.cap_ints() for t in trees],
        final_coeffs=final_coeffs,
        pow_nonce=nonce,
        query_rounds=query_rounds,
    )
    return proof, indices


def _hash_row_ref(row_ints: Sequence[int]) -> list:
    from ..ops import poseidon as pos

    return pos.hash_no_pad_ref(list(row_ints))


def _verify_merkle_ref(row_ints, index, siblings, cap) -> bool:
    from ..ops import poseidon as pos

    digest = _hash_row_ref(row_ints)
    idx = index
    for sib in siblings:
        sib_ints = [int(v) for v in gl.to_int(np.asarray(sib))]
        if idx & 1:
            digest = pos.hash_two_to_one_ref(sib_ints, digest)
        else:
            digest = pos.hash_two_to_one_ref(digest, sib_ints)
        idx >>= 1
    return digest == [int(v) for v in cap[idx]]


def fri_verify(
    proof: FriProof,
    log_n: int,
    transcript: Transcript,
    cfg: FriConfig,
    eval_at_index: Callable[[int, int], Optional[Tuple[int, int]]],
) -> bool:
    """Verify. ``eval_at_index(round_i, q)`` returns the claimed layer-0
    extension value at domain index q (derived from outer oracle openings,
    which the callback must itself merkle-verify), or None on failure."""
    N = 1 << log_n
    betas = []
    for cap in proof.caps:
        transcript.observe_cap(cap)
        betas.append(transcript.get_extension_challenge())
    n_layers = len(proof.caps)
    final_size = N >> n_layers
    if final_size != (1 << cfg.final_poly_bits):
        return False
    if len(proof.final_coeffs) != max(1, final_size >> cfg.rate_bits):
        return False
    for c in proof.final_coeffs:
        transcript.observe_extension(c)
    if not check_grind(transcript, proof.pow_nonce, cfg.pow_bits):
        return False
    transcript.observe_element(proof.pow_nonce)
    indices = transcript.get_indices(cfg.num_query_rounds, log_n)
    if len(proof.query_rounds) != len(indices):
        return False

    F2 = ext.GFp2
    for round_i, (q, steps) in enumerate(zip(indices, proof.query_rounds)):
        if len(steps) != n_layers:
            return False
        v = eval_at_index(round_i, q)
        if v is None:
            return False
        n = N
        idx = q
        for k, step in enumerate(steps):
            half = n // 2
            p = idx % half
            pos_in_pair = idx // half
            row = step.pair_values  # (2, 2, 2)
            row_ints = [
                (int(gl.to_int(row[j][0])), int(gl.to_int(row[j][1])))
                for j in range(2)
            ]
            if row_ints[pos_in_pair] != (int(v[0]), int(v[1])):
                return False
            flat = [x for pair in row_ints for x in pair]
            if not _verify_merkle_ref(flat, p, step.siblings, proof.caps[k]):
                return False
            shift, w, _ = _layer_domain(log_n, k)
            x = (shift * pow(w, p, gl.P)) % gl.P
            v0, v1 = row_ints
            s_plus = F2.add(v0, v1)
            s_minus = F2.sub(v0, v1)
            inv_x = pow(x, gl.P - 2, gl.P)
            term = F2.mul(betas[k], F2.mul(s_minus, (inv_x, 0)))
            v = F2.mul(F2.add(s_plus, term), (INV2, 0))
            idx = p
            n = half
        # final check: v == final_poly(x) on the final domain
        shift_f = pow(gl.GENERATOR, 1 << n_layers, gl.P)
        w_f = gl.primitive_root_of_unity(log_n - n_layers)
        xf = (shift_f * pow(w_f, idx, gl.P)) % gl.P
        acc = (0, 0)
        for c in reversed(proof.final_coeffs):
            acc = F2.add(F2.mul(acc, (xf, 0)), c)
        if acc != v:
            return False
    return True

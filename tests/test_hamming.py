"""Packed-descriptor Hamming ops vs numpy brute-force oracle."""

import numpy as np
import jax.numpy as jnp

from vslam_tpu.ops import hamming

RNG = np.random.default_rng(2)


def rand_desc(n):
    return RNG.integers(0, 2**32, size=(n, 8), dtype=np.uint32)


def np_hamming(a, b):
    abits = np.unpackbits(a.view(np.uint8), axis=1)
    bbits = np.unpackbits(b.view(np.uint8), axis=1)
    return (abits[:, None, :] != bbits[None, :, :]).sum(-1).astype(np.int32)


def test_pack_unpack_roundtrip():
    d = rand_desc(32)
    bits = hamming.unpack_bits(jnp.asarray(d))
    back = np.asarray(hamming.pack_bits(bits))
    np.testing.assert_array_equal(back, d)


def test_hamming_matrix_oracle():
    q, db = rand_desc(37), rand_desc(53)
    ours = np.asarray(hamming.hamming_matrix(jnp.asarray(q), jnp.asarray(db)))
    np.testing.assert_array_equal(ours, np_hamming(q, db))


def test_hamming_matrix_mxu_matches_popcount():
    q, db = rand_desc(64), rand_desc(128)
    a = np.asarray(hamming.hamming_matrix(jnp.asarray(q), jnp.asarray(db)))
    b = np.asarray(hamming.hamming_matrix_mxu(jnp.asarray(q), jnp.asarray(db)))
    np.testing.assert_array_equal(a, b)


def test_hamming_pairwise():
    a, b = rand_desc(40), rand_desc(40)
    ours = np.asarray(hamming.hamming_pairwise(jnp.asarray(a), jnp.asarray(b)))
    oracle = np.diagonal(np_hamming(a, b))
    np.testing.assert_array_equal(ours, oracle)


def test_masked_argmin_gate():
    q, db = rand_desc(10), rand_desc(20)
    dist = hamming.hamming_matrix(jnp.asarray(q), jnp.asarray(db))
    mask = jnp.ones((10, 20), bool)
    idx, best, valid = hamming.masked_argmin(dist, mask, max_distance=300)
    oracle = np_hamming(q, db)
    np.testing.assert_array_equal(np.asarray(idx), oracle.argmin(1))
    assert np.all(np.asarray(valid))
    # Tight gate invalidates everything
    _, _, valid2 = hamming.masked_argmin(dist, mask, max_distance=0)
    assert not np.any(np.asarray(valid2))


def test_masked_argmin_respects_mask():
    q, db = rand_desc(5), rand_desc(8)
    dist = hamming.hamming_matrix(jnp.asarray(q), jnp.asarray(db))
    oracle = np_hamming(q, db)
    # Mask out the unmasked argmin column for row 0
    mask = np.ones((5, 8), bool)
    j0 = oracle[0].argmin()
    mask[0, j0] = False
    idx, _, valid = hamming.masked_argmin(dist, jnp.asarray(mask), 300)
    masked_oracle = oracle.copy().astype(float)
    masked_oracle[0, j0] = np.inf
    assert int(np.asarray(idx)[0]) == masked_oracle[0].argmin()


def test_mutual_best_identity():
    # Matching a set against itself must produce the identity assignment.
    d = rand_desc(30)
    dist = hamming.hamming_matrix(jnp.asarray(d), jnp.asarray(d))
    idx, valid, best = hamming.mutual_best_match(dist, jnp.ones((30, 30), bool), 10)
    np.testing.assert_array_equal(np.asarray(idx), np.arange(30))
    assert np.all(np.asarray(valid))
    assert np.all(np.asarray(best) == 0)


def test_mutual_best_is_one_to_one():
    q, db = rand_desc(64), rand_desc(64)
    dist = hamming.hamming_matrix(jnp.asarray(q), jnp.asarray(db))
    idx, valid, _ = hamming.mutual_best_match(dist, jnp.ones((64, 64), bool), 256)
    matched = np.asarray(idx)[np.asarray(valid)]
    assert len(matched) == len(set(matched.tolist()))

"""FPS and diverse-memory tests vs a numpy greedy oracle."""

import numpy as np
import jax.numpy as jnp

from diffusionvid_tpu.ops import (
    farthest_point_sample, select_farthest_k_greedy, pairwise_l2_distance,
    init_memory, update_erase_memory,
)


def np_fps(dist, k, valid=None):
    n = dist.shape[0]
    valid = np.ones(n, bool) if valid is None else valid
    temp = np.where(valid, 1e10, -1.0)
    out = [0]
    last = 0
    for _ in range(1, k):
        temp = np.where(valid, np.minimum(temp, dist[last]), -1.0)
        last = int(np.argmax(temp))
        out.append(last)
    return np.array(out)


def test_fps_matches_oracle():
    rng = np.random.RandomState(3)
    feats = rng.randn(50, 8).astype(np.float32)
    dist = np.asarray(pairwise_l2_distance(jnp.asarray(feats)))
    got = np.asarray(farthest_point_sample(jnp.asarray(dist), 12))
    np.testing.assert_array_equal(got, np_fps(dist, 12))


def test_fps_skips_invalid():
    rng = np.random.RandomState(4)
    feats = rng.randn(30, 8).astype(np.float32)
    valid = np.arange(30) < 20
    dist = np.asarray(pairwise_l2_distance(jnp.asarray(feats)))
    got = np.asarray(farthest_point_sample(jnp.asarray(dist), 10,
                                           valid=jnp.asarray(valid)))
    np.testing.assert_array_equal(got, np_fps(dist, 10, valid))
    assert (got < 20).all()


def test_fps_picks_diverse_clusters():
    # 3 tight clusters; k=3 must pick one point from each.
    pts = np.concatenate([
        np.zeros((10, 2)), np.full((10, 2), 100.0),
        np.stack([np.full(10, 100.0), np.zeros(10)], -1)]).astype(np.float32)
    idx = np.asarray(select_farthest_k_greedy(jnp.asarray(pts), 3))
    clusters = set(idx // 10)
    assert clusters == {0, 1, 2}


def test_memory_fill_then_dedup():
    capacity, d = 8, 4
    mem = init_memory(capacity, d)
    rng = np.random.RandomState(5)

    # Under-capacity merge: order preserved, count grows.
    new = jnp.asarray(rng.randn(5, d).astype(np.float32))
    mem = update_erase_memory(mem, new, jnp.asarray(5))
    assert int(mem.count) == 5
    np.testing.assert_allclose(np.asarray(mem.feats[:5]), np.asarray(new), atol=1e-6)
    assert np.all(np.asarray(mem.feats[5:]) == 0)

    # Second merge: 5 + 5 > 8 → FPS dedup down to capacity.
    new2 = jnp.asarray(rng.randn(5, d).astype(np.float32))
    mem2 = update_erase_memory(mem, new2, jnp.asarray(5))
    assert int(mem2.count) == capacity
    merged = np.concatenate([np.asarray(mem.feats[:5]), np.asarray(new2)])
    dist = np.asarray(pairwise_l2_distance(jnp.asarray(merged)))
    valid = np.concatenate([np.ones(5, bool), np.zeros(3, bool), np.ones(5, bool)])
    # Build the valid-masked distance over the padded layout used internally.
    padded = np.zeros((13, d), np.float32)
    padded[:5] = np.asarray(mem.feats[:5])
    padded[8:] = np.asarray(new2)
    dist_p = np.asarray(pairwise_l2_distance(jnp.asarray(padded)))
    exp_idx = np_fps(dist_p, capacity, valid)
    np.testing.assert_allclose(np.asarray(mem2.feats), padded[exp_idx], atol=1e-6)


def test_memory_partial_new_count():
    mem = init_memory(4, 2)
    new = jnp.asarray(np.arange(12, dtype=np.float32).reshape(6, 2))
    mem = update_erase_memory(mem, new, jnp.asarray(2))  # only 2 of 6 valid
    assert int(mem.count) == 2
    np.testing.assert_allclose(np.asarray(mem.feats[:2]), np.asarray(new[:2]))

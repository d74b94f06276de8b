"""Pallas min-distance kernel (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp

from seevcn_tpu.ops.pallas.min_dist import min_sqdist, min_sqdist_reference


def test_matches_reference():
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(700, 3).astype(np.float32) * 5)
    b = jnp.asarray(rng.randn(1300, 3).astype(np.float32) * 5)
    got = np.asarray(min_sqdist(a, b, interpret=True))
    ref = np.asarray(min_sqdist_reference(a, b))
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-4)


def test_b_valid_mask():
    a = jnp.asarray([[0.0, 0, 0]])
    b = jnp.asarray([[0.1, 0, 0], [5.0, 0, 0]])
    valid = jnp.asarray([False, True])
    got = float(min_sqdist(a, b, b_valid=valid, interpret=True)[0])
    np.testing.assert_allclose(got, 25.0, atol=1e-3)


def test_padding_rows_do_not_leak():
    # N and M far from tile multiples; nearest distances must be exact
    rng = np.random.RandomState(1)
    a = jnp.asarray(rng.randn(3, 3).astype(np.float32))
    b = jnp.asarray(rng.randn(5, 3).astype(np.float32))
    got = np.asarray(min_sqdist(a, b, interpret=True))
    ref = np.asarray(min_sqdist_reference(a, b))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_gram_form_matches_reference_at_lidar_ranges():
    """MXU Gram form with centring stays accurate at real lidar offsets
    (the cancellation regime that motivated the diff form)."""
    rng = np.random.RandomState(2)
    a = rng.randn(500, 3).astype(np.float32) * 3 + [45.0, -20.0, 0.0]
    b = rng.randn(900, 3).astype(np.float32) * 3 + [44.0, -19.0, 0.0]
    got = np.asarray(min_sqdist(jnp.asarray(a), jnp.asarray(b),
                                interpret=True, form="gram"))
    ref = np.asarray(min_sqdist_reference(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=1e-3)


def test_gram_form_with_invalid_rows():
    a = jnp.asarray([[10.0, 0, 0]])
    b = jnp.asarray([[10.1, 0, 0], [15.0, 0, 0]])
    valid = jnp.asarray([False, True])
    got = float(min_sqdist(a, b, b_valid=valid, interpret=True,
                           form="gram")[0])
    np.testing.assert_allclose(got, 25.0, atol=1e-2)


def test_pruned_form_exact_within_radius():
    """prune_radius: distances <= radius^2 must be exact; farther queries
    may read the 1e18 sentinel but must never pass a within-radius test."""
    rng = np.random.RandomState(3)
    # queries spread wide, supports clustered (the replacement-stage shape)
    a = rng.uniform(-50, 50, (2500, 3)).astype(np.float32)
    centers = rng.uniform(-40, 40, (4, 3)).astype(np.float32)
    b = (centers[:, None, :] + rng.uniform(-2, 2, (4, 300, 3))
         ).reshape(-1, 3).astype(np.float32)
    r = 0.8
    got = np.asarray(min_sqdist(jnp.asarray(a), jnp.asarray(b),
                                interpret=True, prune_radius=r))
    ref = np.asarray(min_sqdist_reference(jnp.asarray(a), jnp.asarray(b)))
    got_in, ref_in = got <= r * r, ref <= r * r
    assert (got_in == ref_in).all()
    np.testing.assert_allclose(got[ref_in], ref[ref_in], atol=1e-4)
    # pruned-away rows only ever read HIGHER than the truth (up to f32
    # rounding of large squared distances)
    assert (got >= ref * (1 - 1e-5) - 1e-4).all()


def test_pruned_form_with_invalid_rows():
    a = jnp.asarray([[10.0, 0, 0], [-30.0, 2, 1]])
    b = jnp.asarray([[10.1, 0, 0], [15.0, 0, 0]])
    valid = jnp.asarray([True, False])
    got = np.asarray(min_sqdist(a, b, b_valid=valid, interpret=True,
                                prune_radius=0.5))
    np.testing.assert_allclose(got[0], 0.01, atol=1e-4)
    assert got[1] > 0.25  # far query: pruned or huge, never within radius

"""UNetV2 sparse encoder-decoder + inverse sparse conv correctness."""
import pytest

import numpy as np
import jax
import jax.numpy as jnp

from seevcn_tpu.ops import sparse as SP
from test_sparse import _random_sparse, _dense_conv

pytestmark = pytest.mark.slow  # heavy tier: full model/backbone builds


def test_inverse_conv_matches_dense_transpose_semantics():
    """inverse conv = for each target p, sum over k of in[(p+pad-k)/s]:
    verify against explicit numpy computation."""
    rng = np.random.RandomState(0)
    # build a strided conv first to get a consistent down/up pair
    st, dense, occ = _random_sparse(rng, batch=1, dims=(4, 6, 6), cin=3)
    w_down = rng.randn(27, 3, 5).astype(np.float32) * 0.3
    down = SP.sparse_conv3d(st, jnp.asarray(w_down), 3, 2, 1,
                            out_capacity=st.features.shape[0])
    w_up = rng.randn(27, 5, 4).astype(np.float32) * 0.3
    up = SP.sparse_inverse_conv3d(down, jnp.asarray(w_up), st, kernel_size=3,
                                  stride=2, padding=1)
    assert up.spatial_shape == st.spatial_shape
    got = np.asarray(up.features)
    m = np.asarray(up.mask)
    # numpy reference over the dense downsampled grid
    dcoords = np.asarray(down.coords)
    dfeats = np.asarray(down.features)
    dmask = np.asarray(down.mask)
    ddense = {}
    for i in np.where(dmask)[0]:
        ddense[tuple(dcoords[i])] = dfeats[i]
    wk = w_up.reshape(3, 3, 3, 5, 4)
    coords = np.asarray(st.coords)
    for i in np.where(m)[0]:
        b, z, y, x = coords[i]
        acc = np.zeros(4, np.float32)
        for kz in range(3):
            for ky in range(3):
                for kx in range(3):
                    num = np.array([z + 1 - kz, y + 1 - ky, x + 1 - kx])
                    if (num % 2 != 0).any():
                        continue
                    q = num // 2
                    f = ddense.get((b, q[0], q[1], q[2]))
                    if f is not None:
                        acc += f @ wk[kz, ky, kx]
        np.testing.assert_allclose(got[i], acc, atol=1e-4)


def test_unetv2_shapes():
    from seevcn_tpu.models.modules.unet3d import UNetV2

    rng = np.random.RandomState(1)
    st, dense, occ = _random_sparse(rng, batch=2, dims=(25, 16, 16), cin=4,
                                    density=0.02, capacity=320)
    model = UNetV2(input_channels=4)
    variables = model.init(jax.random.PRNGKey(0), st, train=False)
    out = model.apply(variables, st, train=False)
    pf = out["point_features"]
    assert pf.spatial_shape == st.spatial_shape
    assert pf.features.shape == (320, 16)
    assert np.isfinite(np.asarray(pf.features)).all()
    # decoder output is active exactly where the input was
    np.testing.assert_array_equal(np.asarray(pf.mask), np.asarray(st.mask))
    assert out["encoded_spconv_tensor"].features.shape[-1] == 128

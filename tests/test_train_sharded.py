"""Sharded training-step tests on the virtual 8-device CPU mesh."""
import pytest

import numpy as np
import jax
import jax.numpy as jnp

from seevcn_tpu.parallel.mesh import make_mesh, shard_batch, replicated
from seevcn_tpu.train.train import create_train_state, make_train_step, shard_train_step
from seevcn_tpu.models.detectors.second import build_detector
from test_detector import _mini_cfg, _fake_batch

pytestmark = pytest.mark.slow  # heavy tier: full model/backbone builds


def test_train_step_single_device():
    cfg = _mini_cfg()
    model, dcfg = build_detector(cfg)
    rng = np.random.RandomState(0)
    pts, valid, gt = _fake_batch(rng, b=2)
    variables = model.init({"params": jax.random.PRNGKey(0)}, pts, valid, train=False)
    state = create_train_state(model, variables, _opt_cfg(), total_steps=10)
    step = make_train_step(model, donate=False)
    s1, m1 = step(state, pts, valid, gt, jax.random.PRNGKey(3))
    s2, m2 = step(s1, pts, valid, gt, jax.random.PRNGKey(3))
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))
    assert int(s2.step) == 2
    # params actually moved
    d = jax.tree_util.tree_reduce(
        lambda a, p: a + float(jnp.abs(p[0] - p[1]).sum()),
        jax.tree.map(lambda a, b: (a, b), state.params, s2.params), 0.0)
    assert d > 0


def _opt_cfg():
    from seevcn_tpu.utils.config import Cfg
    return Cfg({"OPTIMIZER": "adam_onecycle", "LR": 0.003, "WEIGHT_DECAY": 0.01,
                "MOMENTUM": 0.9, "MOMS": [0.95, 0.85], "PCT_START": 0.4,
                "DIV_FACTOR": 10, "GRAD_NORM_CLIP": 10, "NUM_EPOCHS": 1})


def test_train_step_8dev_mesh_matches_single():
    """dp=8 sharded step must produce (numerically close) same update as
    unsharded — the psum-mean equivalence of DDP."""
    assert len(jax.devices()) == 8
    cfg = _mini_cfg()
    model, dcfg = build_detector(cfg)
    rng = np.random.RandomState(1)
    pts, valid, gt = _fake_batch(rng, b=8)
    variables = model.init({"params": jax.random.PRNGKey(0)}, pts[:2], valid[:2],
                           train=False)
    state = create_train_state(model, variables, _opt_cfg(), total_steps=10)

    plain_step = make_train_step(model, donate=False)
    s_pl, m_pl = plain_step(state, pts, valid, gt, jax.random.PRNGKey(7))

    # sharded step runs AFTER the plain one: it donates its state, and
    # device_put(state, replicated) may share the original device-0
    # buffer, so `state` must not be read again afterwards
    sharded_step, mesh = shard_train_step(model)
    state_r = jax.device_put(state, replicated(mesh))
    b_pts, b_valid, b_gt = shard_batch(mesh, (pts, valid, gt))
    s_sh, m_sh = sharded_step(state_r, b_pts, b_valid, b_gt, jax.random.PRNGKey(7))

    np.testing.assert_allclose(float(m_sh["loss"]), float(m_pl["loss"]),
                               rtol=2e-3, atol=2e-3)
    # compare a couple of parameter leaves after the update
    leaf_sh = jax.tree_util.tree_leaves(s_sh.params)[0]
    leaf_pl = jax.tree_util.tree_leaves(s_pl.params)[0]
    np.testing.assert_allclose(np.asarray(leaf_sh), np.asarray(leaf_pl),
                               rtol=1e-2, atol=1e-4)


def test_onecycle_schedule_shape():
    from seevcn_tpu.train.optim import build_lr_schedule
    sched = build_lr_schedule(_opt_cfg(), 100)
    lrs = [float(sched(i)) for i in [0, 40, 99]]
    assert lrs[0] < lrs[1]       # warmup to peak at pct_start
    assert lrs[2] < lrs[0]       # final below initial
    np.testing.assert_allclose(lrs[1], 0.003, rtol=1e-3)


def test_onecycle_schedule_finite_at_tiny_total_steps():
    """optax floors the warmup boundary to int(pct_start*T); for tiny T that
    used to produce a zero-width interval and an all-NaN schedule (every
    param went NaN after the first optimizer step)."""
    import optax

    from seevcn_tpu.train.optim import build_lr_schedule, build_optimizer
    for total in (1, 2, 3, 4):
        sched = build_lr_schedule(_opt_cfg(), total)
        vals = [float(sched(t)) for t in range(total + 2)]
        assert all(np.isfinite(v) for v in vals), (total, vals)
    tx = build_optimizer(_opt_cfg(), 2)
    params = {"w": jnp.ones((4,))}
    st = tx.init(params)
    for _ in range(3):
        up, st = tx.update({"w": jnp.full((4,), 0.5)}, st, params)
        params = optax.apply_updates(params, up)
    assert np.isfinite(np.asarray(params["w"])).all()


def test_train_step_dp_mp_mesh():
    """2x4 (dp, mp) mesh: the BEV spatial axis is sharded over 'mp'
    (constrain_bev; XLA inserts conv halo exchanges) and the step matches
    the dp-only result."""
    cfg = _mini_cfg()
    model, dcfg = build_detector(cfg)
    rng = np.random.RandomState(3)
    pts = np.zeros((8, 600, 3), np.float32)
    pts[..., 0] = rng.uniform(0.5, 15.5, (8, 600))
    pts[..., 1] = rng.uniform(-7.5, 7.5, (8, 600))
    pts[..., 2] = rng.uniform(-1.9, 1.9, (8, 600))
    valid = np.ones((8, 600), bool)
    gt = np.zeros((8, 4, 8), np.float32)
    gt[:, 0] = [8, 0, 0, 4.2, 2.0, 1.6, 0.3, 1]
    key = jax.random.PRNGKey(0)

    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(pts[:1]), jnp.asarray(valid[:1]),
                           train=False)
    from seevcn_tpu.utils.config import Cfg
    opt = Cfg({"OPTIMIZER": "adam_onecycle", "LR": 1e-3, "WEIGHT_DECAY": 0.01,
               "MOMS": [0.95, 0.85], "PCT_START": 0.4, "DIV_FACTOR": 10,
               "GRAD_NORM_CLIP": 10})

    results = {}
    from seevcn_tpu.parallel.mesh import replicated, set_active_mesh
    for mp in (1, 4):
        mesh = make_mesh(8, mp=mp)
        state = create_train_state(model, variables, opt, total_steps=4)
        step, _ = shard_train_step(model, mesh)
        b = shard_batch(mesh, (jnp.asarray(pts), jnp.asarray(valid),
                               jnp.asarray(gt)))
        state, metrics = step(state, *b, key)

        # forward parity: the sharded conv stack (halo exchanges on the W
        # axis) must reproduce the unsharded activations
        def fwd(v, p, pv):
            prev = set_active_mesh(mesh)
            try:
                return model.apply(v, p, pv, train=False)["batch_box_preds"]
            finally:
                set_active_mesh(prev)

        preds = jax.jit(fwd)(variables, b[0], b[1])
        results[mp] = (float(metrics["loss"]), np.asarray(preds))
    np.testing.assert_allclose(results[1][0], results[4][0], rtol=1e-4)
    # adam's sign(grad)-like first step is reduction-order sensitive for
    # near-zero grads; the forward activations are the meaningful parity
    np.testing.assert_allclose(results[1][1], results[4][1],
                               rtol=1e-3, atol=1e-3)


def test_lr_warmup_cosine():
    """LR_WARMUP: half-cosine ramp to LR over WARMUP_EPOCH epochs before the
    step-decay schedule (reference CosineWarmupLR)."""
    from seevcn_tpu.train.optim import build_lr_schedule
    from seevcn_tpu.utils.config import Cfg

    cfg = Cfg({"OPTIMIZER": "adam", "LR": 0.01, "NUM_EPOCHS": 10,
               "LR_WARMUP": True, "WARMUP_EPOCH": 2,
               "DECAY_STEP_LIST": [5], "LR_DECAY": 0.1})
    sched = build_lr_schedule(cfg, total_steps=100)   # 10 steps/epoch
    vals = np.array([float(sched(t)) for t in range(100)])
    # reference CosineWarmupLR starts at eta_min = LR / DIV_FACTOR
    # (train_utils/optimization/__init__.py:58-61), default DIV_FACTOR 10
    np.testing.assert_allclose(vals[0], 0.001, rtol=1e-4)
    assert vals[5] < vals[15]                  # monotone ramp
    np.testing.assert_allclose(vals[20], 0.01, rtol=1e-5)  # reaches LR
    np.testing.assert_allclose(vals[60], 0.001, rtol=1e-5) # decayed at ep 5


def test_remat_policy_parity():
    """BACKBONE_3D.REMAT ("layer" | "dots" | "none") is a pure
    recompute-vs-save scheduling knob — one train step must produce the
    same loss and (numerically) the same updated params under all three
    (backbone3d._remat_wrap)."""
    results = {}
    for remat in ("layer", "dots", "none"):
        cfg = _mini_cfg()
        cfg.MODEL.BACKBONE_3D["MODE"] = "hybrid"
        cfg.MODEL.BACKBONE_3D["REMAT"] = remat
        model, dcfg = build_detector(cfg)
        rng = np.random.RandomState(0)
        pts, valid, gt = _fake_batch(rng, b=1)
        variables = model.init({"params": jax.random.PRNGKey(0)},
                               pts, valid, train=False)
        state = create_train_state(model, variables, _opt_cfg(),
                                   total_steps=10)
        step = make_train_step(model, donate=False)
        s1, m1 = step(state, pts, valid, gt, jax.random.PRNGKey(3))
        results[remat] = (float(m1["loss"]),
                          jax.tree_util.tree_leaves(s1.params))
    l0, p0 = results["layer"]
    for remat in ("dots", "none"):
        l, p = results[remat]
        np.testing.assert_allclose(l, l0, rtol=1e-5)
        for a, b in zip(p0, p):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)

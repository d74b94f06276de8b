"""Sharded training-step tests on the virtual 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp

from seevcn_tpu.parallel.mesh import make_mesh, shard_batch, replicated
from seevcn_tpu.train.train import create_train_state, make_train_step, shard_train_step
from seevcn_tpu.models.detectors.second import build_detector
from test_detector import _mini_cfg, _fake_batch


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

    sharded_step, mesh = shard_train_step(model)
    state_r = jax.device_put(state, replicated(mesh))
    b_pts, b_valid, b_gt = shard_batch(mesh, (pts, valid, gt))
    s_sh, m_sh = sharded_step(state_r, b_pts, b_valid, b_gt, jax.random.PRNGKey(7))

    plain_step = make_train_step(model, donate=False)
    s_pl, m_pl = plain_step(state, pts, valid, gt, jax.random.PRNGKey(7))

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

"""Tunnel failure classification (VERDICT r4 #5).

Round 4's da2 scale-up died four times on a deterministic
`remote_compile HTTP 413` that blind retries could never fix. The train
path now classifies backend failures — permanent payload overflows fail
fast with the cause printed; transient tunnel flakes exit with a
distinct code the runbook retries with --resume.
"""
import numpy as np
import pytest

from seevcn_tpu.utils import tunnel


# the literal messages from runs/da_tpu_runbook3.log and bench captures
MSG_413 = ("INTERNAL: http://127.0.0.1:8113/remote_compile: HTTP 413: "
           "Failed to buffer the request body: length limit exceeded")
MSG_UNAVAILABLE = ("UNAVAILABLE: failed to connect to all addresses; "
                   "last error: UNKNOWN")


def test_classify_payload_too_large():
    assert tunnel.classify_tunnel_error(RuntimeError(MSG_413)) == \
        "payload_too_large"


def test_classify_transient():
    assert tunnel.classify_tunnel_error(RuntimeError(MSG_UNAVAILABLE)) == \
        "transient"
    for msg in ("HTTP 503: service unavailable",
                "Connection reset by peer",
                "DEADLINE_EXCEEDED: timed out"):
        assert tunnel.classify_tunnel_error(RuntimeError(msg)) == "transient"


def test_classify_other():
    assert tunnel.classify_tunnel_error(ValueError("shape mismatch")) == \
        "other"


def test_explain_mentions_const_bytes():
    text = tunnel.explain_tunnel_error(RuntimeError(MSG_413),
                                       const_bytes=540_000_000)
    assert "PERMANENT" in text and "540 MB" in text
    assert "retry" in text.lower()


def test_jaxpr_const_bytes_flags_closure_capture():
    """The 413 mechanism itself: a closed-over array becomes a jaxpr
    constant (counted); the same array passed as an argument does not."""
    import jax.numpy as jnp

    big = jnp.asarray(np.ones((1000, 100), np.float32))

    def closes_over(x):
        return (big * x).sum()

    def takes_arg(b, x):
        return (b * x).sum()

    x = jnp.ones(())
    assert tunnel.jaxpr_const_bytes(closes_over, x) >= 400_000
    assert tunnel.jaxpr_const_bytes(takes_arg, big, x) < 4_000


def test_train_step2_has_no_large_constants():
    """Regression guard for the exact r4 failure: the DA train step must
    not bake the dataset into its jaxpr. Build a tiny version of
    cmd_train's step function and assert its constant payload stays
    small even with a 'large' dataset array in scope."""
    import jax
    import jax.numpy as jnp

    n, p, B = 64, 512, 4
    d_pts = jnp.zeros((n, p, 3), jnp.float32)
    d_val = jnp.ones((n, p), bool)
    d_gt = jnp.zeros((n, 12, 8), jnp.float32)
    base = jax.random.PRNGKey(0)
    flip_p = jnp.asarray([1.0, -1.0, 1.0], jnp.float32)
    flip_g = jnp.asarray([1, -1, 1, 1, 1, 1, -1, 1], jnp.float32)

    # mirrors scripts/da_experiment.py cmd_train.step2's signature: data
    # enters as arguments, so consts are only the rng key + flip vectors
    def step2(step, dp, dv, dg):
        r = jax.random.fold_in(base, step)
        r_idx, r_flip, _ = jax.random.split(r, 3)
        idx = jax.random.randint(r_idx, (B,), 0, n)
        flip = jax.random.bernoulli(r_flip)
        bp = dp[idx] * jnp.where(flip, flip_p, 1.0)
        bg = dg[idx] * jnp.where(flip, flip_g, 1.0)
        return bp.sum() + bg.sum() + dv[idx].sum()

    cb = tunnel.jaxpr_const_bytes(step2, jnp.zeros((), jnp.int32),
                                  d_pts, d_val, d_gt)
    assert cb < 1_000, f"step closes over {cb} bytes of constants"


class TestWatchdog:
    """Hung-readback watchdog: a wedged tunnel readback blocks forever
    WITHOUT raising (det_raw3 stalled 27 min at step 6400 with a healthy
    backend probe alongside), so exception classification alone cannot
    recover it. The watchdog converts a missed progress beat into the
    same transient exit the exception path uses."""

    def test_beats_keep_it_quiet(self):
        import time
        fired = []
        with tunnel.Watchdog(deadline_s=0.5, what="t",
                             on_stall=lambda idle: fired.append(idle)) as dog:
            for _ in range(8):
                time.sleep(0.1)
                dog.beat()           # beat inside the deadline: never fires
        assert not fired

    def test_stall_fires_with_idle_time(self):
        import time
        fired = []
        dog = tunnel.Watchdog(deadline_s=0.3, what="t",
                              on_stall=lambda idle: fired.append(idle))
        try:
            time.sleep(1.2)          # no beats: simulated hung readback
        finally:
            dog.stop()
        assert fired and fired[0] > 0.3

    def test_stop_prevents_late_fire(self):
        import time
        fired = []
        dog = tunnel.Watchdog(deadline_s=0.3, what="t",
                              on_stall=lambda idle: fired.append(idle))
        dog.stop()
        time.sleep(0.8)
        assert not fired

    def test_default_action_is_transient_exit(self):
        # production default hard-exits EXIT_TRANSIENT (os._exit: the main
        # thread is unrecoverably blocked in the runtime) — verify in a
        # subprocess so the suite survives
        import subprocess
        import sys
        code = (
            "import time\n"
            "from seevcn_tpu.utils import tunnel\n"
            "dog = tunnel.Watchdog(deadline_s=0.3, what='t')\n"
            "time.sleep(30)\n"
        )
        r = subprocess.run([sys.executable, "-c", code], timeout=25,
                           capture_output=True, text=True)
        assert r.returncode == tunnel.EXIT_TRANSIENT
        assert "WATCHDOG" in r.stderr

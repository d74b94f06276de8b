import os
import numpy as np

from seevcn_tpu.utils.profiling import (AverageMeter, MetricsWriter, Timer,
                                        create_logger, set_random_seed)


def test_average_meter():
    m = AverageMeter()
    m.update(1.0)
    m.update(3.0)
    assert m.avg == 2.0 and m.count == 2


def test_timer_sync():
    import jax.numpy as jnp

    t = Timer()
    with t.measure(sync=None):
        x = jnp.zeros(10) + 1
    with t.measure(sync=x):
        y = x * 2
    assert t.meter.count == 2 and t.meter.sum > 0


def test_logger_and_writer(tmp_path):
    log = create_logger(str(tmp_path / "log.txt"))
    log.info("hello")
    assert os.path.exists(tmp_path / "log.txt")
    w = MetricsWriter(str(tmp_path / "tb"))
    w.scalar("loss", 1.5, 3)
    w.close()
    files = os.listdir(tmp_path / "tb")
    assert files  # event file or metrics.jsonl


def test_seed():
    set_random_seed(7)
    a = np.random.rand(3)
    set_random_seed(7)
    b = np.random.rand(3)
    np.testing.assert_array_equal(a, b)

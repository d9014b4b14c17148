"""Dataset pipeline tests — determinism across processes (VERDICT r1 Weak #4:
`hash(name)` is salted per process; synthetic data must be reproducible so
`cli eval` of a shipped artifact means something)."""

import subprocess
import sys

import numpy as np

from bnn_pynq_tpu.train import data


def test_synthetic_deterministic_in_process():
    a = data.load("mnist")
    b = data.load("mnist")
    assert a.synthetic and b.synthetic
    np.testing.assert_array_equal(a.x_train, b.x_train)
    np.testing.assert_array_equal(a.y_test, b.y_test)


def test_synthetic_deterministic_cross_process():
    code = ("import numpy as np; from bnn_pynq_tpu.train import data; "
            "d = data.load('cifar10'); "
            "print(int(d.x_train.astype(np.int64).sum()), "
            "int(d.y_train.astype(np.int64).sum()))")
    outs = [
        subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, check=True, timeout=120).stdout.strip()
        for _ in range(2)
    ]
    here = data.load("cifar10")
    local = (f"{int(here.x_train.astype(np.int64).sum())} "
             f"{int(here.y_train.astype(np.int64).sum())}")
    assert outs[0] == outs[1] == local


def test_datasets_differ_from_each_other():
    a = data.load("cifar10")
    b = data.load("svhn")
    assert a.x_train.shape == b.x_train.shape
    assert not np.array_equal(a.x_train, b.x_train)

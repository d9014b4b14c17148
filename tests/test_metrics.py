"""Roofline accounting sanity (SURVEY.md §5.1)."""

import json

from bnn_pynq_tpu.models import get_config
from bnn_pynq_tpu.utils.metrics import (RunMetrics, chip_specs,
                                        mxu_roofline_images_per_sec,
                                        network_macs, roofline_fraction)


def test_network_macs_cnv_exact():
    # hand-computed: conv 1.5552M+28.9014M+10.6168M+14.7456M+2.6542M+0.5898M
    # + dense 0.1311M+0.2621M+0.0051M
    assert network_macs(get_config("cnv-w1a1")) == 59_461_376


def test_network_macs_lfc():
    assert network_macs(get_config("lfc-w1a1")) == \
        784 * 1024 + 2 * 1024 * 1024 + 1024 * 10


def test_roofline_positive():
    cfg = get_config("cnv-w1a1")
    sol = mxu_roofline_images_per_sec(cfg, chip_specs("v5e"))
    assert sol > 1e6  # v5e speed-of-light for CNV is ~3.3M img/s
    assert 0 < roofline_fraction(cfg, sol / 2, chip_specs("v5e")) <= 0.51


def test_run_metrics_emit(tmp_path):
    m = RunMetrics("test").record(a=1.5, b=2)
    line = m.emit(str(tmp_path / "metrics.jsonl"))
    payload = json.loads(line)
    assert payload["a"] == 1.5 and payload["run"] == "test"
    assert (tmp_path / "metrics.jsonl").exists()

"""Checkpoint/resume subsystem tests (new capability; the reference has no
simulation checkpointing — SURVEY.md §5.4)."""
import os

import numpy as np
import pytest

from opticomlib_tpu.ops import ssfm
from opticomlib_tpu.runtime import (
    PropagationCheckpointer, ssfm_propagate_resumable,
)


def _wgrid(n, fs):
    return 2 * np.pi * np.fft.fftfreq(n) * fs


def _input(n=2048, fs=160e9):
    rng = np.random.default_rng(0)
    from scipy.ndimage import gaussian_filter1d
    bits = rng.integers(0, 2, n // 16).astype(float)
    return gaussian_filter1d(np.repeat(bits, 16), 4).astype(np.complex64) * 0.2


def test_checkpointer_roundtrip(tmp_path):
    ck = PropagationCheckpointer(str(tmp_path), config={"a": 1})
    re = np.arange(16, dtype=np.float32)
    im = -re
    ck.save(1, 10.0, re, im, extra={"note": "seg1"})
    step, z, re2, im2, extra = ck.latest()
    assert step == 1 and z == 10.0
    np.testing.assert_array_equal(re2, re)
    np.testing.assert_array_equal(im2, im)
    assert extra["note"] == "seg1"


def test_checkpointer_prunes_and_keeps_latest(tmp_path):
    ck = PropagationCheckpointer(str(tmp_path), config={}, keep=2)
    for s in range(1, 5):
        ck.save(s, float(s), np.zeros(4, np.float32), np.zeros(4, np.float32))
    files = [f for f in os.listdir(tmp_path) if f.endswith(".npz")]
    assert len(files) == 2
    assert ck.latest()[0] == 4


def test_checkpointer_rejects_config_mismatch(tmp_path):
    ck = PropagationCheckpointer(str(tmp_path), config={"gamma": 1.3})
    ck.save(1, 1.0, np.zeros(4, np.float32), np.zeros(4, np.float32))
    ck2 = PropagationCheckpointer(str(tmp_path), config={"gamma": 2.0})
    with pytest.raises(ValueError):
        ck2.latest()


def test_checkpointer_survives_corrupt_latest(tmp_path):
    ck = PropagationCheckpointer(str(tmp_path), config={})
    ck.save(1, 1.0, np.ones(4, np.float32), np.zeros(4, np.float32))
    ck.save(2, 2.0, 2 * np.ones(4, np.float32), np.zeros(4, np.float32))
    # simulate a crash that truncated the newest file
    newest = os.path.join(str(tmp_path), "ckpt_00000002.npz")
    with open(newest, "wb") as f:
        f.write(b"garbage")
    step, z, re, im, _ = ck.latest()
    assert step == 1 and z == 1.0


def test_resumable_matches_straight_run(tmp_path):
    A = _input()
    w = _wgrid(A.size, 160e9)
    kw = dict(alpha=0.2, beta_2=-20, gamma=1.3, h=0.5)

    straight = np.asarray(ssfm.ssfm_propagate(A, w, length=4.0, **kw))

    d1 = str(tmp_path / "run")
    out = ssfm_propagate_resumable(A, w, length=4.0, ckpt_dir=d1,
                                   segment_km=1.0, **kw)
    np.testing.assert_allclose(out, straight, atol=1e-5)

    # simulate crash after 2 segments: rerun from existing ckpt_dir
    ck = PropagationCheckpointer(d1, config=dict(
        length=4.0, alpha=0.2, beta_2=-20, beta_3=0.0, gamma=1.3, h=0.5,
        phi_max=0.01, segment_km=1.0, n=A.size))
    # drop to the z=2 checkpoint by deleting later ones
    for f in sorted(os.listdir(d1)):
        if f > "ckpt_00000002.npz":
            os.unlink(os.path.join(d1, f))
    resumed = ssfm_propagate_resumable(A, w, length=4.0, ckpt_dir=d1,
                                       segment_km=1.0, **kw)
    np.testing.assert_allclose(resumed, straight, atol=1e-5)

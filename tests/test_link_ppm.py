"""Fully-fused PPM receiver (LinkProgram.dsp_ppm) and its device decision
kernels, vs the host models.ppm pipeline (reference ppm.py:309-415)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opticomlib_tpu import gv
from opticomlib_tpu.link import LinkSpec, build_link
from opticomlib_tpu.models import ppm
from opticomlib_tpu.ops.prbs import prbs as _prbs

M, K, SPS, R = 8, 3, 16, 10e9
N_SYM = 2**9
N_SLOTS = N_SYM * M


@pytest.fixture(autouse=True)
def _reset():
    gv.default()
    gv(sps=SPS, R=R, N=N_SLOTS, Vpi=5)
    yield
    gv.default()


def _prog(**kw):
    base = dict(Vpp=5, offset=-2.5, bias=-2.5, Vpi=5, P0=5,
                pulse_shape="gaussian", loss_dB=3, ER_dB=26,
                pd_BW=0.75 * R, include_thermal=False, include_shot=False)
    base.update(kw)
    return build_link(LinkSpec(**base), n_bits=N_SLOTS)


def _bits():
    b, _ = _prbs(15, length=N_SYM * K)
    return b


class TestDecisionKernels:
    def test_sdd_matches_host(self):
        rng = np.random.default_rng(0)
        slot_samples = rng.normal(0.2, 0.3, N_SLOTS)
        pos_d = np.asarray(ppm.sdd_positions_jax(
            jnp.asarray(slot_samples, jnp.float32), M))
        pos_h = np.argmax(slot_samples.reshape(-1, M), axis=-1)
        np.testing.assert_array_equal(pos_d, pos_h)

    def test_hdd_repair_invariants(self):
        """Exactly one position per symbol; multi-ON symbols keep one of
        their ON slots; single-ON symbols keep theirs (reference
        ppm.py:184-190 semantics with keyed randomness)."""
        rng = np.random.default_rng(1)
        on = (rng.random(N_SLOTS) < 0.2).astype(np.float32)
        key = jax.random.PRNGKey(3)
        pos = np.asarray(ppm.hdd_positions_jax(jnp.asarray(on), M, key))
        assert pos.shape == (N_SYM,)
        assert ((0 <= pos) & (pos < M)).all()
        on2 = on.reshape(-1, M)
        for i in range(N_SYM):
            s = on2[i].sum()
            if s >= 1:
                assert on2[i, pos[i]] == 1, f"symbol {i} lost its ON slot"

    def test_hdd_zero_on_uniformish(self):
        """Zero-ON symbols get a random slot that varies with the key."""
        on = jnp.zeros(M * 256, jnp.float32)
        p1 = np.asarray(ppm.hdd_positions_jax(on, M, jax.random.PRNGKey(0)))
        p2 = np.asarray(ppm.hdd_positions_jax(on, M, jax.random.PRNGKey(1)))
        assert len(np.unique(p1)) == M  # all slots hit across 256 symbols
        assert (p1 != p2).any()

    def test_positions_to_bits_matches_decoder(self):
        rng = np.random.default_rng(2)
        pos = rng.integers(0, M, N_SYM)
        bits_d = np.asarray(ppm.positions_to_bits_jax(
            jnp.asarray(pos, jnp.int32), M))
        onehot = np.zeros(N_SLOTS, np.uint8)
        onehot[np.arange(N_SYM) * M + pos] = 1
        bits_h = ppm.PPM_DECODER(onehot, M).data
        np.testing.assert_array_equal(bits_d, bits_h)


class TestFusedPPM:
    def test_soft_matches_host_exactly(self):
        """Noiseless soft decision: fused == host SDD+DECODER bit-for-bit;
        and with thermal noise, same waveform -> same decisions."""
        bits = _bits()
        for kw, seed in ((dict(), 0),
                         (dict(P0=-18, include_thermal=True), 5)):
            prog = _prog(**kw)
            d = prog.dsp_ppm(M, decision="soft", bits=bits, seed=seed)
            res = prog.run(bits=ppm.PPM_ENCODER(bits, M), seed=seed)
            rx = ppm.DSP(res.v, M, decision="soft")
            ber_h = ppm.BER_analizer("counter", Tx=bits, Rx=rx)
            assert d.ber == pytest.approx(ber_h, abs=1e-12), kw

    def test_soft_nonzero_ber_at_low_power(self):
        prog = _prog(P0=-24, include_thermal=True)
        d = prog.dsp_ppm(M, decision="soft", bits=_bits(), seed=5)
        assert 0.0 < d.ber < 0.6

    def test_hard_noiseless_zero_ber(self):
        prog = _prog()
        d = prog.dsp_ppm(M, decision="hard", bits=_bits(), seed=0)
        assert d.n_errors == 0
        assert d.threshold is not None
        assert d.eye is not None and d.eye.mu1 > d.eye.mu0

    def test_hard_noisy_tracks_host(self):
        """With noise, fused-hard BER is statistically consistent with the
        host hard path on the same waveform (HDD randomness differs:
        keyed jax.random vs np.random)."""
        bits = _bits()
        prog = _prog(P0=-20, include_thermal=True)
        d = prog.dsp_ppm(M, decision="hard", bits=bits, seed=7)
        res = prog.run(bits=ppm.PPM_ENCODER(bits, M), seed=7)
        np.random.seed(0)
        rx = ppm.DSP(res.v, M, decision="hard")
        ber_h = ppm.BER_analizer("counter", Tx=bits, Rx=rx)
        assert d.ber == pytest.approx(ber_h, abs=0.05)

    def test_reproducible(self):
        prog = _prog(P0=-20, include_thermal=True)
        bits = _bits()
        d1 = prog.dsp_ppm(M, decision="hard", bits=bits, seed=9)
        d2 = prog.dsp_ppm(M, decision="hard", bits=bits, seed=9)
        assert d1.ber == d2.ber

    def test_validation(self):
        prog = _prog()
        with pytest.raises(ValueError):
            prog.dsp_ppm(3, bits=_bits())
        with pytest.raises(ValueError):
            prog.dsp_ppm(M, decision="nope", bits=_bits())
        with pytest.raises(ValueError):
            prog.dsp_ppm(M, bits=np.ones(7))


class TestWdmPpmHard:
    def test_wdm_hard_matches_dsp_ppm_per_channel(self):
        """Round-4: dsp_wdm_ppm(decision='hard') equals dsp_ppm(hard)
        channel-for-channel (same per-channel graph: seed c -> seed+c,
        same keyed HDD)."""
        n_ch = 3
        b, _ = _prbs(15, length=n_ch * N_SYM * K)
        bits = np.asarray(b.data, np.uint8).reshape(n_ch, N_SYM * K)
        prog = _prog(P0=-20, include_thermal=True)
        sw = prog.dsp_wdm_ppm(n_ch, M=M, decision="hard", bits=bits,
                              seed=4)
        assert sw.decision == "hard"
        assert sw.threshold is not None
        for c in range(n_ch):
            d = prog.dsp_ppm(M, decision="hard", bits=bits[c],
                             seed=4 + c)
            assert sw.n_errors[c] == d.n_errors, c
            assert sw.threshold[c] == pytest.approx(d.threshold,
                                                    rel=1e-6), c

    def test_wdm_hard_noiseless_zero_ber(self):
        prog = _prog()
        sw = prog.dsp_wdm_ppm(2, M=M, decision="hard", seed=0)
        assert (sw.ber == 0).all()

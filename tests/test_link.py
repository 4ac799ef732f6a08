"""Fused end-to-end link program (opticomlib_tpu/link.py).

Checks the single-XLA-program chain against the staged device pipeline
(reference architecture: examples/ook_transmission_fiber_simulation.py):
same physics, same keyed noise draws, BER parity.
"""
import jax
import numpy as np
import pytest

from opticomlib_tpu import gv
from opticomlib_tpu.devices import DAC, FIBER, LASER, MZM, PD, PRBS
from opticomlib_tpu.link import EDFASpec, FiberSpec, LinkSpec, build_link
from opticomlib_tpu.models import ook

SPS, R, NBITS = 16, 10e9, 2**11


@pytest.fixture(autouse=True)
def _reset():
    gv.default()
    gv(sps=SPS, R=R, N=NBITS, Vpi=5)
    yield
    gv.default()


def _spec(**kw):
    base = dict(Vpp=5, offset=-2.5, bias=-2.5, Vpi=5, P0=5,
                pulse_shape="gaussian", loss_dB=3, ER_dB=26, pd_BW=0.75 * R)
    base.update(kw)
    return LinkSpec(**base)


def _staged(tx, *, lw=None, rin=None, fiber=None, edfa=None,
            include_noise="none"):
    """Reference-architecture staged chain with keyed noise via gv(seed=...)."""
    v = DAC(tx, Vpp=5, offset=-2.5, pulse_shape="gaussian")
    mod = MZM(LASER(P0=5, lw=lw, rin=rin), v, bias=-2.5, Vpi=5,
              loss_dB=3, ER_dB=26)
    x = mod
    if fiber is not None:
        x = FIBER(x, **fiber)
    if edfa is not None:
        from opticomlib_tpu.devices import EDFA
        x = EDFA(x, **edfa)
    return PD(x, BW=0.75 * R, include_noise=include_noise)


class TestFusedVsStaged:
    def test_noiseless_b2b_matches_staged(self):
        """Back-to-back, no noise: fused == staged away from the circular-
        convolution edges (f32 vs f64 + span truncation tolerance)."""
        tx = PRBS(order=9, len=NBITS)
        spec = _spec(include_thermal=False, include_shot=False)
        prog = build_link(spec, n_bits=NBITS)
        res = prog.run(bits=tx, seed=0)
        ref = _staged(tx)

        a = res.v.to_numpy().real
        b = ref.to_numpy().real
        m = 64 * SPS  # skip pulse-span edges
        scale = np.abs(b).max()
        np.testing.assert_allclose(a[m:-m], b[m:-m], atol=2e-3 * scale)

    def test_noiseless_fiber_matches_staged(self):
        tx = PRBS(order=9, len=NBITS)
        fiber = dict(length=50, alpha=0.2, beta_2=-21.0, gamma=1.3)
        spec = _spec(stages=(FiberSpec(**fiber),),
                     include_thermal=False, include_shot=False)
        prog = build_link(spec, n_bits=NBITS)
        res = prog.run(bits=tx, seed=0)
        ref = _staged(tx, fiber=fiber)

        a = res.v.to_numpy().real
        b = ref.to_numpy().real
        m = 64 * SPS
        scale = np.abs(b).max()
        np.testing.assert_allclose(a[m:-m], b[m:-m], atol=5e-3 * scale)

    def test_keyed_noise_draws_match_staged(self):
        """Key-threading parity: fused seed=s draws the same laser/EDFA/PD
        noise as the staged chain after gv(seed=s)."""
        tx = PRBS(order=9, len=NBITS)
        fiber = dict(length=10, alpha=0.2, beta_2=-21.0, gamma=1.3)
        spec = _spec(lw=1e5, rin=-150,
                     stages=(FiberSpec(**fiber), EDFASpec(G=10, NF=5)),
                     include_thermal=True, include_shot=True)
        prog = build_link(spec, n_bits=NBITS)
        res = prog.run(bits=tx, seed=123)

        gv(sps=SPS, R=R, N=NBITS, seed=123)
        ref = _staged(tx, lw=1e5, rin=-150, fiber=fiber,
                      edfa=dict(G=10, NF=5), include_noise="all")

        a = res.v.to_numpy().real
        b = ref.to_numpy().real
        m = 64 * SPS
        scale = np.abs(b).max()
        # identical noise realizations -> only f32/convolution error remains
        np.testing.assert_allclose(a[m:-m], b[m:-m], atol=2e-2 * scale)
        # and it is genuinely noisy (sanity: noise dominates the tolerance)
        gv(sps=SPS, R=R, N=NBITS, seed=321)
        ref_other = _staged(tx, lw=1e5, rin=-150, fiber=fiber,
                            edfa=dict(G=10, NF=5), include_noise="all")
        diff_same = np.abs(a[m:-m] - b[m:-m]).max()
        diff_other = np.abs(a[m:-m] - ref_other.to_numpy().real[m:-m]).max()
        assert diff_other > 5 * diff_same

    def test_b2b_ber_zero_at_high_snr(self):
        spec = _spec()
        prog = build_link(spec, n_bits=NBITS)
        res = prog.run(seed=7)
        assert res.ber() < 1e-3

    def test_fiber_edfa_ber(self):
        spec = _spec(stages=(FiberSpec(length=50, alpha=0.2, beta_2=-21.0,
                                       gamma=1.3), EDFASpec(G=10, NF=5)))
        prog = build_link(spec, n_bits=NBITS)
        res = prog.run(seed=7)
        assert res.ber() < 1e-2

    def test_dsp_threshold_consistency(self):
        """The fused output drives the standard host DSP (GET_EYE path)."""
        spec = _spec()
        prog = build_link(spec, n_bits=NBITS)
        res = prog.run(seed=7)
        rx, eye_obj, rth = ook.DSP(res.v)
        ber = ook.BER_analizer("counter", Tx=res.tx, Rx=rx)
        assert ber < 1e-3
        assert eye_obj.er > 10


class TestProgramContract:
    def test_reproducible(self):
        prog = build_link(_spec(lw=1e5), n_bits=NBITS)
        a = prog.run(seed=5)
        b = prog.run(seed=5)
        np.testing.assert_array_equal(a.v.to_numpy(), b.v.to_numpy())

    def test_jittable_planar(self):
        """fn is a pure jittable function of (bits_f32, seed_u32, consts)."""
        import jax.numpy as jnp
        prog = build_link(_spec(), n_bits=NBITS)
        bits = jnp.zeros(NBITS, jnp.float32).at[::2].set(1.0)
        v, slots = jax.jit(prog.fn)(bits, jnp.uint32(3), prog.consts)[:2]
        assert v.dtype == jnp.float32
        assert slots.shape == (NBITS,)

    def test_ac_coupling(self):
        prog = build_link(_spec(coupling="AC", include_thermal=False,
                                include_shot=False), n_bits=NBITS)
        res = prog.run(seed=0)
        assert res.v.size == NBITS * SPS

    def test_nrz_and_rcos_shapes(self):
        for shape, kw in (("nrz", ()), ("rcos", (("beta", 0.25),))):
            prog = build_link(_spec(pulse_shape=shape, pulse_kwargs=kw),
                              n_bits=2**9)
            res = prog.run(seed=0)
            assert res.ber() < 0.05

    def test_bad_bits_length(self):
        prog = build_link(_spec(), n_bits=NBITS)
        with pytest.raises(ValueError):
            prog.run(bits=np.zeros(17, np.uint8))


def test_fused_rin_too_high_raises_at_build():
    """Round-3 review fix: the fused link refuses RIN configurations the
    staged LASER would reject per-draw, instead of NaN-ing in-graph."""
    from opticomlib_tpu.link import LinkSpec, build_link
    from opticomlib_tpu.params import SimParams

    spec = LinkSpec(Vpp=5, offset=-2.5, bias=-2.5, Vpi=5, P0=5,
                    pulse_shape="gaussian", stages=(), pd_BW=7.5e9,
                    rin=-80)
    with pytest.raises(ValueError, match="RIN"):
        build_link(spec, n_bits=256, params=SimParams(sps=16, R=10e9))


def test_rin_boundary_staged_raises_fused_flags():
    """Near the RIN validity boundary (round-5, VERDICT missing #2): the
    staged LASER raises on a draw crossing -1 (reference
    devices.py:492-500), while the fused program clamps, completes
    without NaN, and reports rin_ok=False through run() and dsp()."""
    import warnings as _w

    from opticomlib_tpu.params import SimParams

    sps, R_, n_bits = 8, 10e9, 256
    params = SimParams.create(sps=sps, R=R_, _warn=False)
    # sigma_rin ~ 0.25: the expected minimum of n = 2048 draws is
    # ~ -sigma*sqrt(2 ln n) ~= -0.98 > -1, so the build-time guard
    # accepts — but ~6% of seeds still have a draw past -1 (-4 sigma)
    rin_db = 10 * np.log10(0.25 ** 2 / (sps * R_))
    spec = LinkSpec(Vpp=5, offset=-2.5, bias=-2.5, Vpi=5, P0=5,
                    rin=rin_db, pd_BW=0.75 * R_,
                    include_thermal=False, include_shot=False)
    prog = build_link(spec, n_bits, params=params)

    # scan seeds for one that crosses and one that does not
    crossing, clean = None, None
    for s in range(300):
        with _w.catch_warnings():
            _w.simplefilter("ignore")
            r = prog.run(seed=s)
        if r.rin_ok and clean is None:
            clean = s
        if not r.rin_ok and crossing is None:
            crossing = s
        if crossing is not None and clean is not None:
            break
    assert crossing is not None, "no seed crossed -1; raise rin in test"
    assert clean is not None

    # fused: crossing seed -> warning + finite output, no NaN
    with pytest.warns(RuntimeWarning, match="RIN draw crossed"):
        r = prog.run(seed=crossing)
    assert np.isfinite(np.asarray(r.v.signal)).all()
    with pytest.warns(RuntimeWarning, match="RIN draw crossed"):
        d = prog.dsp(seed=crossing, nslots=n_bits)
    assert d.rin_ok is False
    assert np.isfinite(d.threshold)

    # clean seed -> no warning, rin_ok True
    with _w.catch_warnings():
        _w.simplefilter("error", RuntimeWarning)
        d_ok = prog.dsp(seed=clean, nslots=n_bits)
    assert d_ok.rin_ok is True

    # multi-channel paths surface the flag per channel (review fix)
    with pytest.warns(RuntimeWarning, match="channel"):
        sw = prog.dsp_wdm(2, seed=crossing, nslots=n_bits)
    assert sw.rin_ok.shape == (2,)
    assert not sw.rin_ok[0]

    # staged: the SAME physics near the boundary raises on an actual
    # crossing draw (scan keyed seeds like the fused scan above)
    gv(sps=sps, R=R_, N=n_bits)
    raised = False
    for s in range(300):
        try:
            LASER(P0=5, rin=rin_db, key=s)
        except ValueError as err:
            assert "RIN" in str(err) or "Noise power" in str(err)
            raised = True
            break
    assert raised, "staged LASER never raised near the boundary"


def test_matched_error_o4_decides_same_bits_in_noisy_regime():
    """BER-level equal-accuracy evidence at a measurable error rate
    (complements scripts/ber_equal_accuracy.py, whose real-chip sweep
    sits at BER 0): same-noise reference-scheme vs matched-error o4
    links in a thermal-noise-dominated regime with BER ~ 1e-2 must
    produce near-identical decisions and statistically equal BER."""
    from opticomlib_tpu.params import SimParams

    sps, R_, n_bits = 16, 10e9, 4096
    params = SimParams.create(sps=sps, R=R_, _warn=False)
    kw = dict(length=50.0, alpha=0.2, beta_2=-21.0, gamma=1.3)

    def build(method):
        fib = (FiberSpec(phi_max=0.01, **kw) if method == "reference"
               else FiberSpec(method="o4", h=2.0, **kw))
        spec = LinkSpec(Vpp=5, offset=-2.5, bias=-2.5, Vpi=5, P0=-9.0,
                        pulse_shape="gaussian", loss_dB=3, ER_dB=26,
                        stages=(fib,), pd_BW=0.75 * R_,
                        include_thermal=True, include_shot=False)
        return build_link(spec, n_bits, params=params)

    from opticomlib_tpu.ops.prbs import prbs as _prbs
    bits, _ = _prbs(15, length=n_bits)
    results = {}
    for method in ("reference", "o4"):
        prog = build(method)
        d = prog.dsp(bits=bits, seed=3, nslots=n_bits)
        r = prog.run(bits=bits, seed=3)
        slots = np.asarray(r.slots.signal).real
        results[method] = (d, (slots > d.threshold).astype(np.uint8))

    d_ref, rx_ref = results["reference"]
    d_o4, rx_o4 = results["o4"]
    assert 1e-3 < d_ref.ber < 0.2, d_ref.ber  # really in the noisy regime
    # near-identical decisions: scheme splitting error is far below the
    # noise margins, so at most a sliver of threshold-straddlers differ
    disagree = int(np.sum(rx_ref != rx_o4))
    assert disagree <= n_bits * 0.01, disagree
    # statistically equal BER (well inside the binomial CI)
    p = d_ref.ber
    ci = 3 * np.sqrt(p * (1 - p) / n_bits)
    assert abs(d_o4.ber - d_ref.ber) <= max(ci, 3 / n_bits), \
        (d_ref.ber, d_o4.ber)

"""API-surface parity: every public name of the reference package has a
counterpart here, module by module and class by class.

This is the mechanical companion to PARITY.md — if upstream grows a
function or we drop one, this fails with the exact missing names.
Reference modules are imported with their lab-only deps stubbed (same
trick as test_reference_equivalence.py).
"""
import importlib
import os
import sys
import types

import pytest

REF_PATH = "/root/reference"

if not os.path.isdir(os.path.join(REF_PATH, "opticomlib")):
    pytest.skip("reference package not available", allow_module_level=True)


def _stub(name, **attrs):
    # Only stub modules that are genuinely absent from the environment —
    # shadowing an installed module would pollute every later test file.
    import importlib.util
    try:
        if importlib.util.find_spec(name) is not None:
            return
    except (ImportError, ValueError):
        pass
    mod = types.ModuleType(name)
    mod.__path__ = []
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules.setdefault(name, mod)


@pytest.fixture(scope="module")
def ref_mods():
    def _no_pympler(o):
        raise ImportError("pympler stub (test harness)")
    _stub("pympler")
    _stub("pympler.asizeof", asizeof=_no_pympler)
    _stub("pyvisa")
    _stub("serial")
    _stub("serial.tools")
    _stub("serial.tools.list_ports")
    _stub("h5py")
    _stub("tqdm", tqdm=lambda *a, **k: a[0] if a else None)
    _stub("tqdm.auto", tqdm=lambda *a, **k: a[0] if a else None)
    _stub("sklearn")
    _stub("sklearn.cluster", KMeans=type("KMeans", (), {}))
    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    return {m: importlib.import_module(f"opticomlib.{m}")
            for m in ("typing", "devices", "utils", "ook", "ppm", "lab",
                      "logger")}


def _public(mod):
    names = getattr(mod, "__all__", None)
    if names:
        return set(names)
    out = set()
    for n in dir(mod):
        if n.startswith("_"):
            continue
        obj = getattr(mod, n)
        m = getattr(obj, "__module__", None)
        if m and m.startswith("opticomlib"):
            out.add(n)
    return out


# reference module -> the modules here whose union must cover it
_COVERAGE = {
    "typing": ["opticomlib_tpu.signals", "opticomlib_tpu.params",
               "opticomlib_tpu.eyediag", "opticomlib_tpu"],
    "devices": ["opticomlib_tpu.devices", "opticomlib_tpu"],
    "utils": ["opticomlib_tpu.utils", "opticomlib_tpu.eyediag",
              "opticomlib_tpu"],
    "ook": ["opticomlib_tpu.ook"],
    "ppm": ["opticomlib_tpu.ppm"],
    "lab": ["opticomlib_tpu.lab"],
    "logger": ["opticomlib_tpu.logger"],
}


@pytest.mark.parametrize("ref_name", sorted(_COVERAGE))
def test_module_surface_covered(ref_mods, ref_name):
    have = set()
    for m in _COVERAGE[ref_name]:
        have |= set(dir(importlib.import_module(m)))
    missing = sorted(_public(ref_mods[ref_name]) - have)
    assert not missing, (
        f"opticomlib.{ref_name} public names missing here: {missing}")


# (reference class, ours) pairs whose public members must all exist
def _class_pairs(ref_mods):
    import opticomlib_tpu.eyediag as ed
    import opticomlib_tpu.params as pr
    import opticomlib_tpu.signals as sg
    t = ref_mods["typing"]
    return [
        (t.binary_sequence, sg.binary_sequence),
        (t.electrical_signal, sg.electrical_signal),
        (t.optical_signal, sg.optical_signal),
        (t.eye, ed.eye),
        (t.global_variables, pr.GlobalVariables),
    ]


def test_class_members_covered(ref_mods):
    problems = []
    for rc, mc in _class_pairs(ref_mods):
        missing = sorted(n for n in dir(rc)
                         if not n.startswith("_") and not hasattr(mc, n))
        if missing:
            problems.append(f"{rc.__name__}: {missing}")
    assert not problems, "; ".join(problems)


def test_signal_dunders_covered(ref_mods):
    dunders = ["__add__", "__sub__", "__mul__", "__truediv__", "__pow__",
               "__invert__", "__and__", "__or__", "__xor__", "__eq__",
               "__ne__", "__gt__", "__lt__", "__getitem__", "__call__",
               "__len__", "__iter__", "__array__"]
    problems = []
    for rc, mc in _class_pairs(ref_mods)[:3]:
        missing = [d for d in dunders
                   if d in rc.__dict__ and not hasattr(mc, d)]
        if missing:
            problems.append(f"{rc.__name__}: {missing}")
    assert not problems, "; ".join(problems)


def test_electrical_signal_is_iterable():
    import numpy as np

    from opticomlib_tpu.signals import electrical_signal

    x = electrical_signal(np.arange(4.0), np.ones(4))
    vals = list(x)
    assert np.allclose(vals, np.arange(4.0) + 1.0)


def test_ook_ppm_reexport_devices():
    from opticomlib_tpu import ook, ppm
    for mod in (ook, ppm):
        for name in ("GET_EYE", "LPF", "SAMPLER"):
            assert hasattr(mod, name), f"{mod.__name__} lacks {name}"

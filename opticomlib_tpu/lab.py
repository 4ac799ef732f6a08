"""Lab / hardware layer: instrument drivers and measurement post-processing.

Host-side counterpart of the reference's ``opticomlib/lab.py`` (2,850 LoC:
VISA/SCPI drivers for a Tektronix PPG3204 pattern generator and PED4002
error detector, an IDPhotonics tunable laser, a LeCroy oscilloscope and an
EXFO attenuator, plus offline post-processing ``SYNC``/``GET_EYE_v2`` and
HDF5 persistence — reference lab.py:1-21 autosummary).

Design differences from the reference (fresh implementation, same API):

* all SCPI instruments share one :class:`_SCPIInstrument` base handling the
  debug mode (``addr_ID=None`` prints commands instead of sending them,
  reference lab.py:471-473), query semantics, channel validation and
  parameter clipping — the reference duplicates this logic per driver;
* ``pyvisa``/``pyserial`` are imported lazily: the debug mode (and thus the
  command-formatting tests) works without them installed;
* the pure-DSP parts (``SYNC`` cross-correlation, ``GET_EYE_v2`` known-bits
  eye metrology) run through the framework's vectorized kernels.

The compute path of the framework never touches this module — it is the
"thin host-side harness" called out in BASELINE.json's north star.
"""
from __future__ import annotations

import re
import socket as _socket
import warnings
from numbers import Integral
from typing import Iterable, List, Literal, Optional, Union

import numpy as np
import scipy.signal as sg

from .eyediag import Eye
from .ops.eyeana import kde_min_threshold
from .params import gv
from .signals import BinarySequence, ElectricalSignal, NULL, _has_noise
from .utils.analysis import nearest, str2array, tic, toc

# Drop-in aliases mirroring the names visible in the reference lab module
# namespace (reference lab.py:26-36 imports typing/utils names directly,
# including the numeric ABCs IntegerNumber/RealNumber and Iterable).
binary_sequence = BinarySequence
electrical_signal = ElectricalSignal
eye = Eye
IntegerNumber = Integral
from numbers import Real as RealNumber  # noqa: E402

__all__ = [
    "search_inst", "connect_inst", "list_serial_ports",
    "SYNC", "GET_EYE_v2", "save_h5", "load_h5",
    "PPG3204", "PED4002", "IDPhotonics", "LeCroy_WavExp100H", "EXFO_FVA60B",
]


# ---------------------------------------------------------------------------
# resource discovery (reference lab.py:45-89)
# ---------------------------------------------------------------------------
def search_inst() -> List[str]:
    """List VISA resources visible to the default resource manager
    (reference lab.py:45-51)."""
    import pyvisa as visa
    resources = visa.ResourceManager().list_resources()
    for r in resources:
        print(r)
    return list(resources)


def connect_inst(addr_ID: str):
    """Open a VISA session and print the instrument's ``*IDN?``
    (reference lab.py:53-71)."""
    import pyvisa as visa
    inst = visa.ResourceManager().open_resource(addr_ID)
    try:
        print(inst.query("*IDN?").strip())
    except Exception:
        raise ConnectionError(
            f"Resource {addr_ID} opened but did not answer *IDN?.")
    return inst


def list_serial_ports() -> List[str]:
    """List serial ports on this host (reference lab.py:73-89)."""
    from serial.tools import list_ports
    ports = [p.device for p in list_ports.comports()]
    for p in ports:
        print(p)
    return ports


# ---------------------------------------------------------------------------
# SYNC (reference lab.py:92-155)
# ---------------------------------------------------------------------------
def SYNC(signal_rx, slots_tx, sps: Optional[int] = None):
    """Align a captured waveform to the transmitted pattern.

    FFT cross-correlation of the first ``2L`` received samples against the
    upsampled TX pattern; the peak must exceed ``3*std(corr)`` (false-
    positive guard, reference lab.py:148-149).  Returns
    ``(sync_signal, start_index)``.
    """
    tic()
    if isinstance(signal_rx, ElectricalSignal):
        sps = signal_rx.sps
        signal_rx = np.asarray(signal_rx.signal)
    elif isinstance(signal_rx, np.ndarray):
        if sps is None:
            raise ValueError(
                '"sps" must be provided to perform synchronization.')
    else:
        raise TypeError(
            'The "signal_rx" must be of type `electrical_signal` or '
            '`np.ndarray`.')

    if isinstance(slots_tx, BinarySequence):
        slots_tx = slots_tx.data
    elif not isinstance(slots_tx, np.ndarray):
        raise TypeError(
            'The "slots_tx" must be of type `binary_sequence` or '
            '`np.ndarray`.')

    signal_tx = np.repeat(np.asarray(slots_tx, dtype=float), sps)
    L = signal_tx.size
    if signal_rx.size < L:
        raise BufferError(
            "The length of the received vector must be greater than the "
            "transmitted vector!!")

    window = np.asarray(signal_rx[:2 * L]).real
    corr = sg.fftconvolve(window, signal_tx[::-1], mode="valid")
    if np.max(corr) < 3 * np.std(corr):
        raise ValueError("No correlation maximum found!!")

    i = int(np.argmax(corr))
    out = ElectricalSignal(signal_rx[i:signal_rx.size - (L - i)])
    out.execution_time = toc()
    return out, i


# ---------------------------------------------------------------------------
# GET_EYE_v2 (reference lab.py:158-273)
# ---------------------------------------------------------------------------
def GET_EYE_v2(sync_signal, slots_tx, nslots: int = 4096) -> Eye:
    """Known-sequence eye metrology: split received samples by the
    transmitted bit value and estimate (mu0, mu1, s0, s1) from the +-5%
    slot-center windows, with a density-minimum threshold
    (reference lab.py:158-273).  Returns an :class:`Eye`.
    """
    tic()
    x = sync_signal if isinstance(sync_signal, ElectricalSignal) \
        else ElectricalSignal(sync_signal)
    bits = slots_tx if isinstance(slots_tx, BinarySequence) \
        else BinarySequence(slots_tx)

    sps = x.sps
    d = {"sps": sps, "dt": x.dt}

    n = x.size % (2 * sps)
    if n:
        x = x[:-n]
    # traces fold two slots each -> even slot count (odd user nslots would
    # leave t one slot-pair shorter than y)
    nslots = min(x.size // sps, int(nslots)) // 2 * 2
    x = x[:nslots * sps]

    y = np.asarray(x.signal)
    if _has_noise(x.noise):
        y = y + np.asarray(x.noise)
    y = y.real

    d["y"] = np.roll(y, -sps // 2 + 1)
    d["t"] = np.tile(np.linspace(-1, 1 - 1 / sps, 2 * sps), nslots // 2)

    ref = np.repeat(np.asarray(bits.data[:nslots]), sps)
    ones = y[ref == 1]
    zeros = y[ref == 0]
    d["ones"] = ones
    d["zeros"] = zeros

    slot_phase = np.linspace(-0.5, 0.5, sps, endpoint=False)
    t0 = np.tile(slot_phase, zeros.size // sps)
    t1 = np.tile(slot_phase, ones.size // sps)
    d["t0"], d["t1"] = t0, t1

    d["i"] = sps // 2
    d["t_left"], d["t_right"] = -0.5, 0.5
    d["y_left"] = d["y_right"] = None
    d["t_dist"], d["t_opt"] = 1, 0
    span0, span1 = -0.05, 0.05
    d["t_span0"], d["t_span1"] = span0, span1

    ones_c = ones[(t1 > span0) & (t1 < span1)]
    zeros_c = zeros[(t0 > span0) & (t0 < span1)]

    d["mu0"] = mu0 = float(np.mean(zeros_c).real)
    d["mu1"] = mu1 = float(np.mean(ones_c).real)
    d["s0"] = s0 = float(np.std(zeros_c).real)
    d["s1"] = s1 = float(np.std(ones_c).real)

    d["threshold"] = float(
        kde_min_threshold(np.concatenate([zeros_c, ones_c]), mu0, mu1))

    d["er"] = (10 * np.log10(mu1 / mu0) if mu0 > 0
               else np.inf if mu0 == 0 else np.nan)
    d["eye_h"] = mu1 - 3 * s1 - mu0 - 3 * s0
    d["execution_time"] = toc()
    return Eye(d)


# ---------------------------------------------------------------------------
# HDF5 persistence (reference lab.py:276-333)
# ---------------------------------------------------------------------------
def save_h5(filename: str, **datos) -> None:
    """Save measurement arrays + a ``metadata`` dict to ``<filename>.h5``
    (datasets at the root, metadata as stringified group attributes —
    reference lab.py:276-301)."""
    import h5py
    with h5py.File(filename + ".h5", "w") as f:
        for k, v in datos.items():
            if k == "metadata":
                continue
            arr = np.asarray(v)
            f.create_dataset(k, data=arr,
                             chunks=True if arr.ndim > 1 else None)
        meta = f.create_group("metadata")
        for k, v in datos.get("metadata", {}).items():
            meta.attrs[k] = str(v)


def load_h5(filename: str) -> dict:
    """Load every root dataset (and the ``metadata`` attribute group) from
    ``<filename>.h5`` (reference lab.py:304-333)."""
    import h5py
    data = {}
    with h5py.File(filename + ".h5", "r") as f:
        for key in f.keys():
            node = f[key]
            if isinstance(node, h5py.Dataset):
                data[key] = node[:]
            elif isinstance(node, h5py.Group) and key == "metadata":
                data["metadata"] = {
                    k: (node.attrs[k].decode("utf-8")
                        if isinstance(node.attrs[k], bytes) else node.attrs[k])
                    for k in node.attrs}
    return data


# ---------------------------------------------------------------------------
# shared SCPI machinery
# ---------------------------------------------------------------------------
def _as_bit_array(data) -> np.ndarray:
    """'0101' / iterable -> uint8 bit vector (raises on non-binary)."""
    if isinstance(data, str):
        bits = str2array(data).astype(np.uint8)
    elif isinstance(data, Iterable):
        bits = np.asarray(list(data)).astype(np.uint8)
    else:
        raise ValueError("`data` is not in the correct format")
    if np.any((bits != 0) & (bits != 1)):
        raise ValueError("`data` string must only contain 0 and 1 characters")
    return bits


def _ieee4882_block(bits: np.ndarray) -> str:
    """ASCII-bit IEEE-488.2 definite-length block: ``#<nd><len><bits>``
    (Tektronix pattern-memory format, reference lab.py:679-703)."""
    s = "".join("1" if b else "0" for b in bits)
    return f"#{len(str(len(s)))}{len(s)}{s}"


class _SCPIInstrument:
    """Common VISA/SCPI driver behavior.

    ``addr_ID=None`` puts the driver in **debug mode**: every command is
    printed as ``[DEBUG] <cmd>`` and queries answer ``'0'`` — the same
    manual fake-instrument harness the reference drivers expose
    (lab.py:471-473), so command formatting is testable without hardware.
    """

    CHANNELS: int = 1

    def __init__(self, addr_ID: Optional[str] = None,
                 timeout_ms: int = 10000):
        if addr_ID:
            import pyvisa as visa
            self.inst = visa.ResourceManager().open_resource(addr_ID)
            self.inst.timeout = timeout_ms
            print(self._query("*IDN?").strip())
        else:
            self.inst = None

    def __del__(self):
        try:
            self.inst.clear()
            self.inst.close()
        except AttributeError:
            pass
        except Exception as e:  # pragma: no cover - hardware teardown
            print(e)

    def _query(self, cmd: str):
        if self.inst is None:
            print(f"[DEBUG] {cmd}")
            return "0"
        resp = self.inst.query(cmd)
        if resp == "\n\n":
            # the Tektronix firmware signals an invalid command with a
            # blank double newline instead of an SCPI error
            raise EOFError(f"Invalid command {cmd}")
        if resp == "\n":
            return True
        return resp

    def _check_channels(self, channels) -> np.ndarray:
        if channels is not None and not isinstance(
                channels, (Integral, Iterable)):
            raise ValueError("`channels` is not in the correct format")
        if channels is None:
            return np.arange(1, self.CHANNELS + 1)
        ch = np.atleast_1d(np.asarray(channels, dtype=int))
        if (ch < 1).any() or (ch > self.CHANNELS).any() or \
                ch.size > self.CHANNELS:
            ch = ch.clip(1, self.CHANNELS)[: self.CHANNELS]
            warnings.warn(
                f"The channels number is out of the range. Clipped to {ch}.")
        return ch

    def _clip(self, name: str, value, lo, hi):
        if value < lo or value > hi:
            warnings.warn(
                f"{name} {value} out of range [{lo}, {hi}]. Clipping.")
            return float(np.clip(value, lo, hi))
        return value

    def reset(self):
        """``*RST``."""
        self._query("*RST")
        return self


# ---------------------------------------------------------------------------
# PPG3204 pattern generator (reference lab.py:336-1213)
# ---------------------------------------------------------------------------
class PPG3204(_SCPIInstrument):
    """Tektronix PPG3204 4-channel 32 Gb/s pattern generator driver.

    SCPI over VISA; pattern memory uploads are chunked to 1024 bits per
    command in the ASCII IEEE-488.2 block format.  Instrument limits from
    the manual (reference lab.py:399-428).
    """

    CHANNELS = 4
    PATT_LEN_MIN = 2
    PATT_LEN_MAX = 2**21
    AMPLITUDE_MIN = 0.3
    AMPLITUDE_MAX = 2.0
    OFFSET_MIN = -2.0
    OFFSET_MAX = 3.0
    FREQ_MIN = 1.5e9
    FREQ_MAX = 32e9
    PATT_TYPE = ["DATA", "PRBS"]
    PRBS_ORDERS = [7, 9, 11, 15, 23, 31]
    MAX_MEMORY_LEN = 2**21
    MAX_CHUNK_LEN = 1024
    MIN_SKEW = -25e-12
    MAX_SKEW = 25e-12

    def __init__(self, addr_ID: Optional[str] = None, reset: bool = True):
        super().__init__(addr_ID)
        if reset:
            self.reset()

    # -- pattern configuration ------------------------------------------
    def patt_len(self, length: int, CHs=None):
        """Set the DATA pattern length [bits]."""
        CHs = self._check_channels(CHs)
        length = int(self._clip("Pattern length", length,
                                self.PATT_LEN_MIN, self.PATT_LEN_MAX))
        for ch in CHs:
            self._query(f":DIG{ch}:PATT:LENG {length}")
        return self

    def get_patt_len(self, CHs=None) -> np.ndarray:
        CHs = self._check_channels(CHs)
        return np.array(
            [int(self._query(f":DIG{ch}:PATT:LENG?")) for ch in CHs])

    def patt_type(self, type: Literal["DATA", "PRBS"], CHs=None):
        """Select DATA (memory) or PRBS mode per channel."""
        CHs = self._check_channels(CHs)
        if type.upper() not in self.PATT_TYPE:
            raise ValueError(f"type must be {self.PATT_TYPE}")
        for ch in CHs:
            self._query(f":DIG{ch}:PATT:TYPE {type.upper()}")
        return self

    def get_patt_type(self, CHs=None) -> np.ndarray:
        CHs = self._check_channels(CHs)
        return np.array(
            [str(self._query(f":DIG{ch}:PATT:TYPE?")).strip() for ch in CHs])

    def prbs(self, order: int, CHs=None):
        """Select the PRBS polynomial order (7/9/11/15/23/31)."""
        CHs = self._check_channels(CHs)
        if order not in self.PRBS_ORDERS:
            raise ValueError(f"Order must be one of {self.PRBS_ORDERS}")
        for ch in CHs:
            self._query(f":DIG{ch}:PATT:PLEN {order}")
        return self

    def get_prbs(self, CHs=None) -> np.ndarray:
        CHs = self._check_channels(CHs)
        return np.array(
            [int(self._query(f":DIG{ch}:PATT:PLEN?")) for ch in CHs])

    def data(self, data, start_addr: int = 1, CHs=None):
        """Upload pattern bits to memory, chunked to MAX_CHUNK_LEN per
        command (manual: max 1024 bits/command)."""
        CHs = self._check_channels(CHs)
        bits = _as_bit_array(data)
        limit = self.PATT_LEN_MAX - start_addr + 1
        if bits.size > limit:
            warnings.warn(
                "The length of the data is greater than the maximum memory "
                "length minus the start address. Truncating.")
            bits = bits[:limit]
        for ch in CHs:
            addr = start_addr
            for ofs in range(0, bits.size, self.MAX_CHUNK_LEN):
                chunk = bits[ofs:ofs + self.MAX_CHUNK_LEN]
                self._query(f":DIG{ch}:PATT:DATA {addr},{chunk.size},"
                            f"{_ieee4882_block(chunk)}")
                addr += chunk.size
        return self

    def get_data(self, size: int, start_addr: int = 1, CHs=None):
        """Read back pattern bits from memory."""
        CHs = self._check_channels(CHs)
        out = []
        for ch in CHs:
            got = []
            addr = start_addr
            remaining = int(size)
            while remaining > 0:
                n = min(remaining, self.MAX_CHUNK_LEN)
                resp = str(self._query(f":DIG{ch}:PATTERN:DATA? {addr},{n}"))
                payload = resp.split("#", 1)[-1]
                if payload and payload[0].isdigit():
                    nd = int(payload[0])
                    payload = payload[1 + nd:]
                got.append(np.array([c == "1" for c in payload.strip()],
                                    dtype=np.uint8))
                addr += n
                remaining -= n
            out.append(np.concatenate(got) if got else np.array([], np.uint8))
        return out if len(out) > 1 else out[0]

    def bits_shift(self, bsh: int, CHs=None):
        """Rotate the pattern by ``bsh`` bits."""
        CHs = self._check_channels(CHs)
        for ch in CHs:
            self._query(f":DIG{ch}:PATT:BSH {int(bsh)}")
        return self

    def get_bits_shift(self, CHs=None) -> np.ndarray:
        CHs = self._check_channels(CHs)
        return np.array(
            [int(self._query(f":DIG{ch}:PATT:BSH?")) for ch in CHs])

    # -- electrical configuration ---------------------------------------
    def output(self, state: Union[int, str], CHs=None):
        """Enable/disable channel outputs (0/1/'ON'/'OFF')."""
        CHs = self._check_channels(CHs)
        if isinstance(state, str):
            state = state.upper()
            if state not in ("ON", "OFF"):
                raise ValueError("state must be 0, 1, 'ON' or 'OFF'")
        elif state not in (0, 1):
            raise ValueError("state must be 0, 1, 'ON' or 'OFF'")
        for ch in CHs:
            self._query(f":OUTP{ch} {state}")
        return self

    def get_output(self, CHs=None) -> np.ndarray:
        CHs = self._check_channels(CHs)
        return np.array(
            [str(self._query(f":OUTP{ch}?")).strip() for ch in CHs])

    def data_rate(self, value: float):
        """Bit rate [b/s] within [1.5, 32] Gb/s (shared clock)."""
        value = self._clip("Data rate", value, self.FREQ_MIN, self.FREQ_MAX)
        self._query(f":FREQ {value:.5e}")
        return self

    def get_data_rate(self) -> float:
        return float(self._query(":FREQ?"))

    def skew(self, skew: float, CHs=None):
        """Inter-channel skew [s] within +-25 ps."""
        CHs = self._check_channels(CHs)
        skew = self._clip("Skew", skew, self.MIN_SKEW, self.MAX_SKEW)
        for ch in CHs:
            self._query(f":SKEW{ch} {skew}")
        return self

    def get_skew(self, CHs=None) -> np.ndarray:
        CHs = self._check_channels(CHs)
        return np.array(
            [float(self._query(f":SKEW{ch}?")) for ch in CHs])

    def amplitude(self, value, CHs=None):
        """Output amplitude [V] within [0.3, 2] V (per channel)."""
        CHs = self._check_channels(CHs)
        values = np.broadcast_to(np.atleast_1d(value), CHs.shape)
        for ch, v in zip(CHs, values):
            v = self._clip("Amplitude", float(v),
                           self.AMPLITUDE_MIN, self.AMPLITUDE_MAX)
            self._query(f":VOLT{ch}:POS {v:.1f}v")
        return self

    def get_amplitude(self, CHs=None) -> np.ndarray:
        CHs = self._check_channels(CHs)
        return np.array(
            [float(self._query(f":VOLT{ch}:POS?")) * 1e3 for ch in CHs])

    def offset(self, value: float, CHs=None):
        """DC offset [V] within [-2, 3] V (negative values use the NEG
        node)."""
        CHs = self._check_channels(CHs)
        value = self._clip("Offset", value, self.OFFSET_MIN, self.OFFSET_MAX)
        for ch in CHs:
            if value < 0:
                self._query(f":VOLT{ch}:NEG:OFFS {abs(value):.1f}v")
            else:
                self._query(f":VOLT{ch}:POS:OFFS {value:.1f}v")
        return self

    def get_offset(self, CHs=None) -> np.ndarray:
        CHs = self._check_channels(CHs)
        return np.array(
            [float(self._query(f":VOLT{ch}:OFFS?")) * 1e3 for ch in CHs])

    # -- bulk configuration ---------------------------------------------
    def __call__(self, data_rate: Optional[float] = None,
                 patt_type: Optional[str] = None,
                 patt_len: Optional[int] = None,
                 prbs_order: Optional[int] = None,
                 data=None, bits_shift: Optional[int] = None,
                 amplitude=None, offset: Optional[float] = None,
                 skew: Optional[float] = None,
                 output: Optional[Union[int, str]] = None, CHs=None):
        """Bulk configuration in one call (reference lab.py:1042-1129)."""
        if data_rate is not None:
            self.data_rate(data_rate)
        if patt_type is not None:
            self.patt_type(patt_type, CHs)
            if patt_type.upper() == "PRBS" and prbs_order is not None:
                self.prbs(prbs_order, CHs)
        if patt_len is not None:
            self.patt_len(patt_len, CHs)
        if data is not None:
            self.data(data, CHs=CHs)
        if bits_shift is not None:
            self.bits_shift(bits_shift, CHs)
        if amplitude is not None:
            self.amplitude(amplitude, CHs)
        if offset is not None:
            self.offset(offset, CHs)
        if skew is not None:
            self.skew(skew, CHs)
        if output is not None:
            self.output(output, CHs)
        return self

    setup = __call__

    def get_metadata(self, ch: int = 1) -> dict:
        """Snapshot of the channel configuration (for save_h5 metadata)."""
        return {
            "instrument": "PPG3204",
            "channel": ch,
            "data_rate": self.get_data_rate(),
            "patt_type": self.get_patt_type(ch)[0],
            "patt_len": int(self.get_patt_len(ch)[0]),
            "prbs_order": int(self.get_prbs(ch)[0]),
            "amplitude_mV": float(self.get_amplitude(ch)[0]),
            "offset_mV": float(self.get_offset(ch)[0]),
            "skew_s": float(self.get_skew(ch)[0]),
            "output": self.get_output(ch)[0],
        }

    def print_setup(self, ch: Optional[int] = None) -> None:
        chans = self._check_channels(ch)
        for c in chans:
            print(f"--- PPG3204 CH{c} ---")
            for k, v in self.get_metadata(int(c)).items():
                print(f"  {k}: {v}")


# ---------------------------------------------------------------------------
# PED4002 error detector (reference lab.py:1220-2119)
# ---------------------------------------------------------------------------
class PED4002(_SCPIInstrument):
    """Tektronix PED4002 2-channel error detector driver.

    SCPI node layout (manual p.18/34): channel *n* data -> ``SENSe(2n-1)``,
    channel *n* clock -> ``SENSe(2n)``/``INPut(2n)``.
    """

    CHANNELS = 2
    PATT_TYPE = ["DATA", "PRBS"]
    PRBS_ORDERS = [7, 9, 11, 15, 23, 31]
    PATT_LEN_MAX = 2**21
    MAX_CHUNK_LEN = 1024

    def __init__(self, addr_ID: Optional[str] = None, reset: bool = True):
        super().__init__(addr_ID)
        if reset:
            self.reset()

    @staticmethod
    def _nodes(channel: int):
        """(data_node, clock_node) for a front-panel channel."""
        return 1 + 2 * (channel - 1), 2 + 2 * (channel - 1)

    def reset(self):
        self._query("*RST")
        self._query("*OPC?")
        return self

    # -- pattern configuration ------------------------------------------
    def patt_len(self, length: int, CHs=None):
        CHs = self._check_channels(CHs)
        length = int(self._clip("Pattern length", length, 2,
                                self.PATT_LEN_MAX))
        for ch in CHs:
            d, _ = self._nodes(ch)
            self._query(f":SENS{d}:PATT:LENG {length}")
        return self

    def get_patt_len(self, CHs=None) -> np.ndarray:
        CHs = self._check_channels(CHs)
        return np.array([int(self._query(
            f":SENS{self._nodes(ch)[0]}:PATT:LENG?")) for ch in CHs])

    def patt_type(self, type: Literal["DATA", "PRBS"], CHs=None):
        CHs = self._check_channels(CHs)
        if type.upper() not in self.PATT_TYPE:
            raise ValueError(f"type must be {self.PATT_TYPE}")
        for ch in CHs:
            d, _ = self._nodes(ch)
            self._query(f":SENS{d}:PATT:TYPE {type.upper()}")
        return self

    def get_patt_type(self, CHs=None) -> np.ndarray:
        CHs = self._check_channels(CHs)
        return np.array([str(self._query(
            f":SENS{self._nodes(ch)[0]}:PATT:TYPE?")).strip() for ch in CHs])

    def prbs(self, order: int, CHs=None):
        CHs = self._check_channels(CHs)
        if order not in self.PRBS_ORDERS:
            raise ValueError(f"Order must be one of {self.PRBS_ORDERS}")
        for ch in CHs:
            d, _ = self._nodes(ch)
            self._query(f":SENS{d}:PATT:PLEN {order}")
        return self

    def data(self, data, start_addr: int = 1, CHs=None):
        """Upload the expected pattern (chunked ASCII block format)."""
        CHs = self._check_channels(CHs)
        bits = _as_bit_array(data)
        for ch in CHs:
            d, _ = self._nodes(ch)
            addr = start_addr
            for ofs in range(0, bits.size, self.MAX_CHUNK_LEN):
                chunk = bits[ofs:ofs + self.MAX_CHUNK_LEN]
                self._query(f":SENS{d}:PATT:DATA {addr},{chunk.size},"
                            f"{_ieee4882_block(chunk)}")
                addr += chunk.size
        return self

    def get_data(self, length: int, start_addr: int = 1, CHs=None):
        CHs = self._check_channels(CHs)
        out = []
        for ch in CHs:
            d, _ = self._nodes(ch)
            resp = str(self._query(
                f":SENSE{d}:PATTERN:DATA? {start_addr},{int(length)}"))
            payload = resp.split("#", 1)[-1]
            if payload and payload[0].isdigit():
                nd = int(payload[0])
                payload = payload[1 + nd:]
            out.append(np.array([c == "1" for c in payload.strip()],
                                dtype=np.uint8))
        return out if len(out) > 1 else out[0]

    # -- synchronization -------------------------------------------------
    def sync(self, CHs=None, wait: bool = True):
        """Trigger pattern sync; optionally poll until complete."""
        CHs = self._check_channels(CHs)
        for ch in CHs:
            d, _ = self._nodes(ch)
            self._query(f":SENS{d}:SYNC:EXEC ONCE")
            if wait and self.inst is not None:  # pragma: no cover - hw poll
                while str(self._query(f":SENS{d}:SYNC:EXEC?")).strip() != "0":
                    pass
        return self

    def is_sync(self, CHs=None) -> np.ndarray:
        CHs = self._check_channels(CHs)
        return np.array([str(self._query(
            f":SENS{self._nodes(ch)[0]}:SYNC:STAT?")).strip() == "1"
            for ch in CHs])

    def sync_threshold(self, ber: float, CHs=None):
        """BER threshold above which sync is declared lost."""
        CHs = self._check_channels(CHs)
        for ch in CHs:
            d, _ = self._nodes(ch)
            self._query(f":SENS{d}:SYNC:THR {ber:.1e}")
        return self

    def get_sync_threshold(self, CHs=None) -> np.ndarray:
        CHs = self._check_channels(CHs)
        return np.array([float(self._query(
            f":SENS{self._nodes(ch)[0]}:SYNC:THR?")) for ch in CHs])

    # -- decision-point centering ----------------------------------------
    def center_offset(self, CHs=None, wait: bool = True):
        """Auto-center the decision voltage."""
        CHs = self._check_channels(CHs)
        for ch in CHs:
            d, _ = self._nodes(ch)
            self._query(f":SENS{d}:EYE:OCENter ONCE")
            if wait and self.inst is not None:  # pragma: no cover
                while str(self._query(
                        f":SENS{d}:EYE:OCENter?")).strip() != "0":
                    pass
        return self

    def offset(self, offset: float, CHs=None):
        """Decision voltage offset [mV], clipped to +-300 mV (sent to the
        instrument in volts, reference lab.py:1668-1682)."""
        CHs = self._check_channels(CHs)
        offset = self._clip("Offset", offset, -300, 300)
        for ch in CHs:
            d, _ = self._nodes(ch)
            self._query(f":SENS{d}:EYE:OFFS {offset * 1e-3}")
        return self

    def get_offset(self, CHs=None) -> np.ndarray:
        CHs = self._check_channels(CHs)
        return np.array([float(self._query(
            f":SENS{self._nodes(ch)[0]}:EYE:OFFS?")) for ch in CHs])

    def center_delay(self, CHs=None, wait: bool = True):
        """Auto-center the decision time."""
        CHs = self._check_channels(CHs)
        for ch in CHs:
            d, _ = self._nodes(ch)
            self._query(f":SENS{d}:EYE:TCENter ONCE")
            if wait and self.inst is not None:  # pragma: no cover
                while str(self._query(
                        f":SENS{d}:EYE:TCENter?")).strip() != "0":
                    pass
        return self

    def delay(self, delay: float, CHs=None):
        """Decision-point delay [ps] on the clock INPut node
        (reference lab.py:1714-1729)."""
        CHs = self._check_channels(CHs)
        for ch in CHs:
            _, c = self._nodes(ch)
            self._query(f":INP{c}:DEL {delay}ps")
        return self

    def get_delay(self, CHs=None) -> np.ndarray:
        CHs = self._check_channels(CHs)
        return np.array([float(self._query(
            f":INP{self._nodes(ch)[1]}:DEL?")) for ch in CHs])

    def get_time_edges(self, CHs=None) -> np.ndarray:
        """(left, right) eye time edges [s] at the current BER threshold."""
        CHs = self._check_channels(CHs)
        out = []
        for ch in CHs:
            d, _ = self._nodes(ch)
            out.append([float(self._query(f":SENS{d}:EYE:TEDGE? 1")),
                        float(self._query(f":SENS{d}:EYE:TEDGE? 2"))])
        return np.asarray(out)

    def eye_threshold(self, ber: float, CHs=None):
        """BER contour level used for edge searches."""
        CHs = self._check_channels(CHs)
        for ch in CHs:
            d, _ = self._nodes(ch)
            self._query(f":SENS{d}:EYE:THR {ber}")
        return self

    def get_eye_threshold(self, CHs=None) -> np.ndarray:
        CHs = self._check_channels(CHs)
        return np.array([float(self._query(
            f":SENS{self._nodes(ch)[0]}:EYE:THR?")) for ch in CHs])

    def get_voltage_edges(self, CHs=None) -> np.ndarray:
        """(low, high) eye voltage edges [V] at the current BER threshold."""
        CHs = self._check_channels(CHs)
        out = []
        for ch in CHs:
            d, _ = self._nodes(ch)
            out.append([float(self._query(f":SENS{d}:EYE:VEDG? 1")),
                        float(self._query(f":SENS{d}:EYE:VEDG? 2"))])
        return np.asarray(out)

    # -- measurement gating ----------------------------------------------
    def is_running(self, CHs=None) -> np.ndarray:
        CHs = self._check_channels(CHs)
        return np.array([str(self._query(
            f":SENS{self._nodes(ch)[0]}:GATE:STATE?")).strip() == "1"
            for ch in CHs])

    def run(self, CHs=None):
        CHs = self._check_channels(CHs)
        for ch in CHs:
            d, _ = self._nodes(ch)
            self._query(f":SENS{d}:GATE:STATE ON")
        return self

    def stop(self, CHs=None):
        CHs = self._check_channels(CHs)
        for ch in CHs:
            d, _ = self._nodes(ch)
            self._query(f":SENS{d}:GATE:STATE OFF")
        return self

    def get_ber(self, CHs=None) -> np.ndarray:
        CHs = self._check_channels(CHs)
        return np.array([float(self._query(
            f":FETC:SENS{self._nodes(ch)[0]}:ERAT?")) for ch in CHs])

    def get_error_count(self, CHs=None) -> np.ndarray:
        CHs = self._check_channels(CHs)
        return np.array([int(float(self._query(
            f":FETC:SENS{self._nodes(ch)[0]}:ECO?"))) for ch in CHs])

    def get_bit_count(self, CHs=None) -> np.ndarray:
        CHs = self._check_channels(CHs)
        return np.array([int(float(self._query(
            f":FETC:SENS{self._nodes(ch)[1]}:BCO?"))) for ch in CHs])

    def get_frequency(self, CHs=None) -> np.ndarray:
        CHs = self._check_channels(CHs)
        return np.array([float(self._query(
            f":SENS{self._nodes(ch)[1]}:FREQ?")) for ch in CHs])

    # -- bulk configuration ----------------------------------------------
    def setup(self, patt_type: Optional[str] = None,
              patt_len: Optional[int] = None,
              prbs_order: Optional[int] = None, data=None,
              sync_threshold: Optional[float] = None,
              eye_threshold: Optional[float] = None,
              auto_center: bool = False, run: Optional[bool] = None,
              CHs=None):
        if patt_type is not None:
            self.patt_type(patt_type, CHs)
            if patt_type.upper() == "PRBS" and prbs_order is not None:
                self.prbs(prbs_order, CHs)
        if patt_len is not None:
            self.patt_len(patt_len, CHs)
        if data is not None:
            self.data(data, CHs=CHs)
        if sync_threshold is not None:
            self.sync_threshold(sync_threshold, CHs)
        if eye_threshold is not None:
            self.eye_threshold(eye_threshold, CHs)
        if auto_center:
            self.center_delay(CHs)
            self.center_offset(CHs)
        if run is not None:
            (self.run if run else self.stop)(CHs)
        return self

    __call__ = setup

    def get_metadata(self, ch: int = 1) -> dict:
        return {
            "instrument": "PED4002",
            "channel": ch,
            "patt_type": self.get_patt_type(ch)[0],
            "patt_len": int(self.get_patt_len(ch)[0]),
            "sync_threshold": float(self.get_sync_threshold(ch)[0]),
            "eye_threshold": float(self.get_eye_threshold(ch)[0]),
            "frequency": float(self.get_frequency(ch)[0]),
        }

    def print_setup(self, ch: int = 1) -> None:
        print(f"--- PED4002 CH{ch} ---")
        for k, v in self.get_metadata(ch).items():
            print(f"  {k}: {v}")


# ---------------------------------------------------------------------------
# IDPhotonics tunable laser (reference lab.py:2122-2311)
# ---------------------------------------------------------------------------
class IDPhotonics:
    """IDPhotonics tunable laser over raw TCP socket (or USB serial).

    Line-based command protocol (``CMD args\\n``); ``bwai`` waits for the
    hardware to settle after each setter (reference lab.py:2158-2273).
    Pass ``host=None`` for debug mode (commands are printed).
    """

    def __init__(self, host: Optional[str] = "192.168.0.1", port=2000,
                 timeout: float = 0, usb: bool = False):
        self.usb = usb
        self.host = host
        self.port = port
        self.socket = None
        self.serial = None
        if host is None:
            return  # debug mode
        if usb:
            import serial
            self.serial = serial.Serial(port, 115200, timeout=timeout)
        else:
            self.socket = _socket.socket()
            self.socket.settimeout(None if timeout == 0 else timeout)
            self.socket.connect((host, int(port)))
        print(self._query("*IDN?"))

    def _query(self, command: str, verbose: int = 0) -> str:
        command = command.rstrip("\n")
        if verbose >= 2:
            print("TX: " + command)
        if self.socket is None and self.serial is None:
            print(f"[DEBUG] {command}")
            return "0"
        payload = (command + "\n").encode()
        if self.usb:
            self.serial.write(payload)
            self.serial.flush()
            reply = ""
            while "\n" not in reply:
                reply += self.serial.read(255).decode("latin1")
        else:
            self.socket.sendall(payload)
            reply = ""
            while "\n" not in reply:
                reply += self.socket.recv(1024).decode("utf-8")
        if verbose:
            print(("RX: " if verbose >= 2 else "") + reply)
        return reply.strip(";\r\n")

    def close(self):
        if self.socket is not None:
            self.socket.close()
        if self.serial is not None:
            self.serial.close()
        print("IDPhotonics: disconnected")

    def get_wavelength(self, ch: int = 1) -> float:
        """Current wavelength [nm]."""
        return float(self._query(f"WAV? 1,1,{ch}"))

    def wavelength(self, wavelength: float, ch: int = 1):
        """Set wavelength [nm] and wait for settle."""
        self._query(f"WAV 1,1,{ch},{wavelength}")
        self._query(f"bwai 1,1,{ch}")
        return self

    def get_power(self, ch: int = 1) -> float:
        """Current output power [dBm]."""
        return float(self._query(f"POW? 1,1,{ch}"))

    def power(self, power: float, ch: int = 1):
        """Set output power [dBm], clipped to the hardware limits."""
        if self.socket is not None or self.serial is not None:
            limits = np.array(
                self._query(f"lim? 1,1,{ch}").split(","),
                dtype=float)[-2:]
            power = float(np.clip(power, *sorted(limits)))
        self._query(f"POW 1,1,{ch},{power}")
        self._query(f"bwai 1,1,{ch}")
        return self

    def fine_tune(self, offset: float, ch: int = 1):
        """Frequency fine-tune offset [MHz], clipped to hardware limit."""
        if self.socket is not None or self.serial is not None:
            limit = float(self._query(f"Offset:LIMit? 1,1,{ch}"))
            offset = float(np.clip(offset, -limit, limit))
        self._query(f"Offset 1,1,{ch},{offset}")
        self._query(f"bwai 1,1,{ch}")
        return self

    def output(self, value: bool, ch: Union[int, str] = 1):
        """Enable/disable laser output (``ch='*'`` for all channels)."""
        value = int(bool(value))
        self._query(f"State 1,1,{ch},{value}")
        self._query(f"bwai 1,1,{ch}")
        return self

    def __call__(self, wavelength: Optional[float] = None,
                 power: Optional[float] = None,
                 fine_tune: Optional[float] = None,
                 output: Optional[bool] = None, ch: int = 1):
        if wavelength is not None:
            self.wavelength(wavelength, ch)
        if power is not None:
            self.power(power, ch)
        if fine_tune is not None:
            self.fine_tune(fine_tune, ch)
        if output is not None:
            self.output(output, ch)
        return self

    setup = __call__

    def get_metadata(self, ch: int = 1) -> dict:
        return {
            "instrument": "IDPhotonics",
            "channel": ch,
            "wavelength_nm": self.get_wavelength(ch),
            "power_dBm": self.get_power(ch),
        }

    def print_setup(self, ch: int = 1) -> None:
        print(f"--- IDPhotonics CH{ch} ---")
        for k, v in self.get_metadata(ch).items():
            print(f"  {k}: {v}")


# ---------------------------------------------------------------------------
# LeCroy WaveExpert 100H oscilloscope (reference lab.py:2314-2511)
# ---------------------------------------------------------------------------
class LeCroy_WavExp100H(_SCPIInstrument):
    """LeCroy WaveExpert sampling oscilloscope driver: run control via VBS
    remote commands, waveform capture via WAVEDESC + IEEE-488.2 binary
    block parsing (reference lab.py:2314-2511)."""

    def __init__(self, addr_ID: Optional[str] = None,
                 timeout_ms: int = 10000):
        super().__init__(addr_ID, timeout_ms)
        if self.inst is not None:  # pragma: no cover - hardware setup
            self.inst.write("COMM_HEADER OFF")

    def _write(self, cmd: str) -> None:
        if self.inst is None:
            print(f"[DEBUG] {cmd}")
            return
        self.inst.write(cmd)  # pragma: no cover

    def stop(self):
        self._write("vbs 'app.acquisition.triggermode=\"Stopped\"'")

    def run(self):
        self._write("vbs 'app.acquisition.triggermode=\"Normal\"'")

    def single(self):
        self._write("vbs 'app.acquisition.triggermode=\"Single\"'")

    def autoset(self):
        self._write("vbs 'app.AutoSetup'")

    @staticmethod
    def _extract_value(desc: str, key: str):
        """Pull ``KEY : value`` out of an INSPECT? WAVEDESC dump."""
        m = re.search(rf"{key}\s*:\s*([^\r\n]+)", desc)
        if not m:
            return None
        raw = m.group(1).strip()
        try:
            return float(raw) if ("." in raw or "e" in raw.lower()) \
                else int(raw)
        except ValueError:
            return raw

    def _get_wavedesc(self, ch: str = "C1") -> dict:
        desc = str(self._query(f"{ch}:INSPECT? WAVEDESC"))
        keys = ["VERTICAL_GAIN", "VERTICAL_OFFSET", "HORIZ_INTERVAL",
                "HORIZ_OFFSET", "WAVE_ARRAY_COUNT", "SWEEPS_PER_ACQ",
                "COMM_TYPE"]
        return {k: self._extract_value(desc, k) for k in keys}

    @staticmethod
    def _parse_IEEE488p2_block(raw: bytes, dtype=np.int8) -> np.ndarray:
        """``#<nd><nbytes><payload>`` binary block -> ndarray."""
        i = raw.find(b"#")
        if i < 0:
            raise ValueError("Not an IEEE-488.2 block")
        nd = int(raw[i + 1:i + 2])
        nbytes = int(raw[i + 2:i + 2 + nd])
        start = i + 2 + nd
        return np.frombuffer(raw[start:start + nbytes], dtype=dtype)

    def acquire_waveform(self, ch: str = "C1", points: Optional[int] = None,
                         sweeps: int = 1):
        """Capture ``sweeps`` waveforms and return ``(t, v)`` arrays
        (volts, seconds)."""
        self._write(f"WFSU SP,0,NP,{points if points else 0},FP,0,SN,0")
        desc = self._get_wavedesc(ch)
        gain = desc.get("VERTICAL_GAIN") or 1.0
        offset = desc.get("VERTICAL_OFFSET") or 0.0
        dt = desc.get("HORIZ_INTERVAL") or 1.0
        dtype = np.int16 if desc.get("COMM_TYPE") == "word" else np.int8

        chunks = []
        for _ in range(sweeps):
            if self.inst is None:
                chunks.append(np.zeros(points or 1, dtype=dtype))
                self._write(f"{ch}:WF? DAT1")
                continue
            self.inst.write(f"{ch}:WF? DAT1")  # pragma: no cover
            raw = self.inst.read_raw()  # pragma: no cover
            chunks.append(self._parse_IEEE488p2_block(raw, dtype))
        data = np.concatenate(chunks)
        v = data.astype(float) * gain - offset
        t = np.tile(np.arange(chunks[0].size), sweeps) * dt
        return t, v

    def close(self):
        if self.inst is not None:  # pragma: no cover
            self.inst.close()


# ---------------------------------------------------------------------------
# EXFO FVA-60B variable attenuator (reference lab.py:2514-2632)
# ---------------------------------------------------------------------------
class EXFO_FVA60B:
    """EXFO FVA-60B variable optical attenuator over RS-232.

    Framed ASCII protocol ``>CMD<`` with ``;``-terminated replies
    (reference lab.py:2514-2632).  ``port=None`` = debug mode.
    """

    def __init__(self, port: Optional[str] = None, timeout: float = 11):
        self.ser = None
        if port is None:
            return  # debug mode
        import serial
        self.ser = serial.Serial(
            port=port, baudrate=9600, bytesize=8,
            parity="N", stopbits=1, timeout=timeout)

    def _query(self, command_str: str) -> bytes:
        if self.ser is None:
            print(f"[DEBUG] >{command_str}<")
            return b"0;"
        self.ser.write(f">{command_str}<".encode("ascii"))  # pragma: no cover
        return self.ser.read_until(b";")  # pragma: no cover

    def get_attenuation(self) -> float:
        """Current attenuation [dB] (instrument reports negative)."""
        return -float(self._query("?").strip(b";"))

    def attenuation(self, db_value: float):
        """Set attenuation [dB]."""
        self._query(f"A-{db_value:05.2f}")
        return self

    def wavelength(self, wavelength: float):
        """Set calibration wavelength [nm]."""
        self._query(f"L{int(wavelength)}")
        return self

    def calibrate(self):
        """Zero-dB reference calibration."""
        self._query("Z")
        return self

    def get_insertion_loss(self) -> float:
        return -float(self._query("I").strip(b";"))

    def close(self):
        if self.ser is not None:  # pragma: no cover
            self.ser.close()

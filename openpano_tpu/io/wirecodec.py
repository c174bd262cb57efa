"""4-bit nibble-delta wire codec: host C encoder + pure-XLA device decoder.

The tunneled TPU transport moves host->device bytes at a flat ~55 MB/s
(measured r4: element dtype, chunking, and threading change nothing), so
the 128 MB headline image stack costs ~2.1 s to upload raw — more than the
whole SIFT stage.  This codec halves the bytes losslessly:

  - per-channel-planar rows, left-neighbor delta mod 256;
  - deltas in [-8, 7] (96%+ of photo content) pack two per byte, pairing
    row r with row r + ceil(R/2) so the device-side unpack is a plain
    concatenate (a [*, 2] nibble interleave tile-pads 64x on TPU);
  - out-of-range deltas ride a sparse exception stream, gap-coded to
    u16 (+u8 value) with 0xFFFF escape entries for gaps >= 65535.

Decode is one jit: unpack nibbles -> scatter exceptions -> cumsum mod 256.
Measured on the 38-image headline stack: 64 MB packed + 14 MB exceptions
upload+decode in ~1.3 s vs 2.1 s raw; the grey plane (SIFT input) is
21 MB + ~2 MB and lands in ~0.5 s.

Reference analog: none (the reference reads images from local disk,
lib/imgio.cc:25-57); this is the TPU runtime's answer to feeding pixels to
the compute engine at full speed.
"""

from __future__ import annotations

import functools
import threading
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .. import native

_ESC = 0xFFFF  # gap escape: advance 65535, write nothing


@dataclass(frozen=True)
class WireStream:
    """Host-side encoded plane set ([rows, cols] u8)."""

    packed: np.ndarray  # [ceil(rows/2), cols] u8 (4-bit) / ceil(rows/4) (2-bit)
    gaps: np.ndarray  # [K] u16 (0xFFFF = escape)
    vals: np.ndarray  # [K] u8 (delta byte; 0 for escapes)
    rows: int
    cols: int
    bits: int = 4

    @property
    def nbytes(self) -> int:
        return self.packed.nbytes + self.gaps.nbytes + self.vals.nbytes


def _gap_code(idx: np.ndarray, val: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Sorted absolute indices -> u16 gap stream with 0xFFFF escapes."""
    if idx.size == 0:
        return np.zeros(0, np.uint16), np.zeros(0, np.uint8)
    D = np.diff(idx, prepend=np.int64(-1))  # >= 1
    m = (D - 1) // 65535  # escapes before each real entry
    g = (D - 1) - m * 65535  # residual gap, <= 65534
    total = int(idx.size + m.sum())
    gaps = np.full(total, _ESC, np.uint16)
    vals = np.zeros(total, np.uint8)
    pos = np.cumsum(m + 1) - 1
    gaps[pos] = g.astype(np.uint16)
    vals[pos] = val
    return gaps, vals


def encode_plane(plane: np.ndarray, bits: int = 4) -> WireStream | None:
    """Encode a [rows, cols] u8 plane.  ``bits=2`` selects the quarter-row
    2-bit variant (deltas clip to [-2, 1]) — right for planes whose deltas
    are tiny, e.g. chroma-vs-grey differences (98%+ within [-1, 1]).
    None when the content is too noisy for the bit budget (caller should
    upload raw)."""
    rows, cols = plane.shape
    out = (native.wire_pack4 if bits == 4 else native.wire_pack2)(plane)
    if out is None:
        return None
    packed, idx, val = out
    gaps, vals = _gap_code(idx, val)
    return WireStream(packed=packed, gaps=gaps, vals=vals, rows=rows,
                      cols=cols, bits=bits)


def _bucket(n: int) -> int:
    """Round K up to limit distinct decode signatures."""
    b = 1024
    while b < n:
        b *= 2
    return b


@functools.partial(jax.jit, static_argnames=("rows", "cols", "bits"))
def _decode4(packed, gaps, vals, rows: int, cols: int, bits: int = 4):
    if bits == 4:
        parts = [packed & 0xF, packed >> 4]
        bias = 8
    else:
        parts = [(packed >> sh) & 3 for sh in (0, 2, 4, 6)]
        bias = 2
    delta = jnp.concatenate(parts, axis=0)[:rows].astype(jnp.int32) - bias
    is_esc = gaps == _ESC
    step = jnp.where(is_esc, 65535, gaps.astype(jnp.int32) + 1)
    pos = jnp.cumsum(step) - 1
    write_idx = jnp.where(is_esc, jnp.int32(2**31 - 1), pos)
    sval = ((vals.astype(jnp.int32) + 128) % 256) - 128
    flat = delta.reshape(-1).at[write_idx].set(sval, mode="drop")
    out = jnp.cumsum(flat.reshape(rows, cols), axis=1, dtype=jnp.int32) & 0xFF
    return out.astype(jnp.uint8)


def _pad_exceptions(stream: WireStream) -> tuple[np.ndarray, np.ndarray]:
    k = _bucket(max(1, stream.gaps.size))
    gaps = np.full(k, _ESC, np.uint16)
    vals = np.zeros(k, np.uint8)
    gaps[: stream.gaps.size] = stream.gaps
    vals[: stream.vals.size] = stream.vals
    return gaps, vals


def upload_plane(stream: WireStream):
    """One-shot upload + decode of an encoded plane set -> device u8
    [rows, cols]."""
    gaps, vals = _pad_exceptions(stream)
    dp = jax.device_put(stream.packed)
    dg = jax.device_put(gaps)
    dv = jax.device_put(vals)
    return _decode4(dp, dg, dv, rows=stream.rows, cols=stream.cols,
                    bits=stream.bits)


def upload_u8_rows(plane: np.ndarray):
    """Upload a [rows, cols] u8 plane via the wire codec, falling back to a
    raw device_put when the content defeats the 4-bit budget."""
    stream = encode_plane(plane)
    if stream is None:
        return jax.device_put(plane)
    return upload_plane(stream)


def pack2_rows(plane: np.ndarray) -> np.ndarray:
    """Pack a [rows, cols] plane of 2-bit values ({0,1,2,3}) four-per-byte,
    quarter-row pairing (row r with r+Q, r+2Q, r+3Q; Q = ceil(rows/4)) so
    the device unpack is a plain concatenate.  Pads missing rows with 1
    (the bias value for residual 0)."""
    rows, cols = plane.shape
    q = (rows + 3) // 4
    if q * 4 != rows:
        pad = np.ones((q * 4 - rows, cols), np.uint8)
        plane = np.concatenate([plane, pad], axis=0)
    return (
        plane[:q]
        | (plane[q : 2 * q] << 2)
        | (plane[2 * q : 3 * q] << 4)
        | (plane[3 * q :] << 6)
    ).astype(np.uint8)


@functools.partial(jax.jit, static_argnames=("rows",))
def _unpack2(packed, rows: int):
    parts = [(packed >> s) & 3 for s in (0, 2, 4, 6)]
    return jnp.concatenate(parts, axis=0)[:rows]


def upload_2bit_rows(plane: np.ndarray):
    """Upload a [rows, cols] plane of 2-bit values at 0.25 bytes/element.
    Returns device u8 [rows, cols]."""
    rows = plane.shape[0]
    return _unpack2(jax.device_put(pack2_rows(plane)), rows=rows)


class BackgroundUpload:
    """Run an upload (encode + chunked device_put + decode) in a daemon
    thread so the wire transfer of a late-stage input (the full-res RGB
    stack, needed only by the blender) overlaps the match/BA compute of
    earlier stages.  The thread issues device_puts in ~4 MB chunks so the
    main thread's small dispatch/fetch traffic interleaves between chunks
    instead of stalling behind one monolithic transfer.

    TPU-native analog of the reference's LAZY_READ IO/compute overlap
    (stitcherbase.cc:14-19 + imageref.hh:22)."""

    CHUNK_BYTES = 4 << 20

    def __init__(self, plane, gate_wire: bool = False, bits: int = 4):
        """``plane``: a [rows, cols] u8 array, or a zero-arg callable
        returning one (host-side prep then runs inside the thread too).
        ``bits``: codec variant (4-bit nibble or 2-bit quarter deltas).

        ``gate_wire=True`` holds the WIRE transfer (not the host-side
        encode) until :meth:`release_wire`: the encode overlaps a
        device-bound stage (host cores are idle there), while the chunks
        stay off the wire until the caller's latency-sensitive fetches are
        done.  Deferring the whole thread instead moves the encode into
        the host-BA window and starves its CPU threads (measured: BA
        iters/s 458 -> 309 on the headline)."""
        self._plane = plane
        self._bits = bits
        self._result = None
        self._error: BaseException | None = None
        self._abandoned = False
        self._wire_gate = threading.Event()
        if not gate_wire:
            self._wire_gate.set()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def release_wire(self):
        """Allow the chunked puts to start (no-op if already released)."""
        self._wire_gate.set()

    def abandon(self):
        """Drop the upload: wake the gated thread and have it exit without
        touching the wire.  Callers that may discard an instance before
        ``result()`` (error paths between stages) register this as a
        finalizer so a gate_wire=True thread never parks forever holding
        its ~100 MB encoded stream."""
        self._abandoned = True
        self._wire_gate.set()

    def _run(self):
        try:
            plane = self._plane() if callable(self._plane) else self._plane
            stream = encode_plane(plane, bits=self._bits)
            self._wire_gate.wait()
            if self._abandoned:
                self._error = RuntimeError("BackgroundUpload abandoned")
                return
            if stream is None:
                parts = self._chunked_put(plane)
                self._result = ("raw", parts, plane.shape)
                return
            parts = self._chunked_put(stream.packed)
            gaps, vals = _pad_exceptions(stream)
            dg = jax.device_put(gaps)
            dv = jax.device_put(vals)
            self._result = ("packed", parts, dg, dv, stream.rows,
                            stream.cols, stream.bits)
        except BaseException as e:  # surfaced from result()
            self._error = e
        finally:
            self._plane = None

    def _chunked_put(self, arr: np.ndarray):
        rows_per = max(1, self.CHUNK_BYTES // max(1, arr.shape[1]))
        parts = []
        for lo in range(0, arr.shape[0], rows_per):
            part = jax.device_put(arr[lo : lo + rows_per])
            parts.append(part)
            # THROTTLE: wait for this chunk to land before submitting the
            # next (a 1-element fetch is a true wire roundtrip;
            # block_until_ready returns early on the tunneled transport).
            # Without this the thread enqueues the whole stream instantly
            # and every foreground fetch waits behind ALL of it — measured
            # +1.2 s on the headline match stage.
            np.asarray(part[:1, :1])
        return parts

    def result(self):
        """Join and return the decoded device u8 [rows, cols] array."""
        self._wire_gate.set()  # never deadlock on an unreleased gate
        self._thread.join()
        if self._error is not None:
            raise self._error
        r = self._result
        if r[0] == "raw":
            return jnp.concatenate(r[1], axis=0).reshape(r[2])
        _, parts, dg, dv, rows, cols, bits = r
        packed = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
        return _decode4(packed, dg, dv, rows=rows, cols=cols, bits=bits)


# ---- download direction: device-side encode, host C decode ----
#
# The blended canvas crosses the same slow wire device->host (byte-bound,
# ~30-55 MB/s measured r4/r5), so strips get the mirror treatment of the
# upload codec: pack 4-bit row-deltas + sparse exceptions ON DEVICE (pure
# XLA: subtract, compare, cumsum-compact, scatter into a fixed-cap buffer),
# download ~quarter the bytes, decode in threaded C (native/wire_codec.c
# wire_unpack).  Reference analog: the blender's canvas write is a free
# local store (src/stitch/blender.cc:77-94); on this transport the download
# IS that write.


# planes bigger than this can't pack (idx << 8 | val) into a positive i32;
# CodedFetch row-chunks them
_MAX_PLANE = 1 << 23


@functools.partial(jax.jit, static_argnames=("cap", "bits", "inline_exc"))
def encode_plane_device(plane, cap: int, bits: int = 4,
                        inline_exc: int = 0):
    """Encode a device [R, C] u8 plane (R*C < 2**23) into one i32 wire
    buffer + a sorted exception prefix.

    Returns (wire i32, exc i32 [cap]) where ``wire`` is the bitcast
    packed-nibble plane with the first ``inline_exc`` exception entries
    and then the exception count appended (so on typical content — canvas
    strips measure 0.6-1.5% exceptions — nibbles, exceptions, and count
    all ride ONE async download with no extra wire roundtrip), and
    ``exc[k] = (flat_idx << 8) | delta_byte`` for the k-th exception in
    flat order (sort-compacted: measured 11 ms vs 29 ms for the
    scatter-compaction on a 5.6M plane, and cap-independent vs 25 ms+ for
    searchsorted gathers).  n > inline_exc needs a second fetch from
    ``exc``; n > cap means even that is truncated — caller falls back to
    a raw download."""
    bias, lim, group = (8, 16, 2) if bits == 4 else (2, 4, 4)
    R, C = plane.shape
    x = plane.astype(jnp.int32)
    d = jnp.concatenate([x[:, :1], (x[:, 1:] - x[:, :-1]) & 0xFF], axis=1)
    s = (d + bias) & 0xFF
    exc = s >= lim
    nib = jnp.where(exc, bias, s)
    gl = (R + group - 1) // group
    nib = jnp.pad(nib, ((0, gl * group - R), (0, 0)), constant_values=bias)
    if bits == 4:
        packed = nib[:gl] | (nib[gl:] << 4)
    else:
        packed = (nib[:gl] | (nib[gl:2 * gl] << 2) | (nib[2 * gl:3 * gl] << 4)
                  | (nib[3 * gl:] << 6))
    flat = exc.ravel()
    # dtype pinned: a bare jnp.sum promotes to int64 here, silently turning
    # the concatenated wire into 8-byte elements and scrambling the decode
    n = jnp.sum(flat, dtype=jnp.int32)
    iota = jnp.arange(flat.size, dtype=jnp.int32)
    key = jnp.where(flat, (iota << 8) | (d.ravel() & 0xFF),
                    jnp.int32(2**31 - 1))
    exc_buf = jax.lax.sort(key)[:cap]
    # bitcast packed bytes to i32, append the inline exception prefix and
    # n: one download carries everything on typical content
    pflat = packed.astype(jnp.uint8).ravel()
    pad = (-pflat.size) % 4
    pflat = jnp.pad(pflat, (0, pad))
    wire = jax.lax.bitcast_convert_type(pflat.reshape(-1, 4), jnp.int32)
    tail = [exc_buf[:inline_exc], n[None]] if inline_exc else [n[None]]
    return jnp.concatenate([wire] + tail), exc_buf


def _exc_bucket(n: int) -> int:
    """Round the exception count up so slice shapes (and their compiled
    fetch programs) stay few."""
    b = 4096
    while b < n:
        b *= 2
    return b


class _CodedPlaneFetch:
    """One plane's async coded download (R*C < 2**23)."""

    def __init__(self, plane, cap: int, bits: int):
        self._plane = plane
        R, C = plane.shape
        self._rows, self._cols = int(R), int(C)
        # a slice can't exceed the key array, so cap/inline clamp to the
        # element count or the wire layout would shift on tiny planes
        self._cap = min(int(cap), int(plane.size))
        self._bits = bits
        # inline exception budget: 2% of elements — covers the measured
        # canvas-strip rates (0.6-1.5%) so the common case is ONE transfer
        self._inline = min(self._cap, max(8192, int(plane.size) // 48))
        self._wire, self._exc = encode_plane_device(
            plane, cap=self._cap, bits=bits, inline_exc=self._inline)
        self._wire.copy_to_host_async()

    def wait(self) -> np.ndarray:
        wire = np.asarray(self._wire)
        n = int(wire[-1])
        if n > self._cap:  # content defeated the nibble budget
            from .transfer import fetch

            out = fetch(self._plane)
            self._plane = self._wire = self._exc = None
            return out
        if n <= self._inline:
            exc = wire[-1 - self._inline: -1][:n]
        else:  # rare: exception tail beyond the inline prefix
            k = min(_exc_bucket(n), self._cap)
            exc = np.asarray(self._exc[:k])[:n]
        packed = np.ascontiguousarray(
            wire[: wire.size - 1 - self._inline]).view(np.uint8)
        group = 2 if self._bits == 4 else 4
        gl = (self._rows + group - 1) // group
        packed = packed[: gl * self._cols].reshape(gl, self._cols)
        idx = (exc >> 8).astype(np.int64)
        val = (exc & 0xFF).astype(np.uint8)
        self._plane = self._wire = self._exc = None
        return native.wire_unpack(packed, self._rows, self._cols, idx, val,
                                  bits=self._bits)


class CodedFetch:
    """Async device->host download of a u8 [R, C] plane via the download
    codec: the device packs 4-bit row-deltas + a sort-compacted exception
    stream (encode_plane_device), ONE async transfer carries nibbles +
    count, and ``wait()`` decodes in threaded C (wire_unpack).  Oversized
    planes are row-chunked so exception indices fit the i32 packing;
    noisy planes fall back to a raw fetch per chunk."""

    def __init__(self, plane, cap: int | None = None, bits: int = 4):
        R, C = int(plane.shape[0]), int(plane.shape[1])
        rows_per = max(1, min(R, _MAX_PLANE // max(C, 1)))
        self._parts = []
        for lo in range(0, R, rows_per):
            chunk = plane[lo: lo + rows_per]
            ccap = cap if cap is not None else max(
                4096, int(chunk.shape[0] * C) // 12)
            self._parts.append(_CodedPlaneFetch(chunk, cap=ccap, bits=bits))

    def wait(self) -> np.ndarray:
        out = [p.wait() for p in self._parts]
        self._parts = []
        return out[0] if len(out) == 1 else np.concatenate(out, axis=0)

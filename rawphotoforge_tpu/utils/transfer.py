"""Device->host transfer helpers tuned for remote/tunneled backends.

The reference's readback is one aligned copy_texture_to_buffer + map_async
(rust/photo-editor/src/image.rs:202-276) — on a locally attached GPU a
single mapping is optimal. Through a remote PJRT tunnel a single large
fetch is latency/window-bound (~25 MB/s measured), while several
concurrent medium-sized fetches sustain ~3x that. These helpers split a
device array into flat bands and fetch them in parallel threads, and move
the u8 quantization for exports onto the device so the link carries 1
byte/sample instead of 4.
"""

from __future__ import annotations

import functools
from concurrent.futures import ThreadPoolExecutor

import numpy as np

# ~8 MB bands keep per-stream transfers large enough to amortize RTT while
# giving the link enough concurrent streams to fill its window (measured
# sweet spot on the axon tunnel: 8 bands/24MP-u8-image, 16 threads).
_BAND_BYTES = 8 << 20
_MAX_BANDS = 32
_MAX_THREADS = 16
_MIN_PARALLEL_BYTES = 16 << 20


def _is_device_array(x) -> bool:
    return hasattr(x, "addressable_shards")


# Upload bands: the host->device direction saturates with fewer streams
# than the fetch direction (measured on the axon tunnel: x4-x8 bands
# ~1.6x a single put, x16 regresses to single-stream rates).
_MAX_UPLOAD_BANDS = 8


def put_np(arr: np.ndarray, bands: int | None = None,
           threads: int | None = None):
    """Upload a host array to the default device via parallel bands.

    The mirror of fetch_np for the host->device direction: the array is
    viewed flat, split into contiguous ranges, each ``jax.device_put``
    in its own thread, then reassembled on device (one small concat
    program per band split — compiled once per shape, unlike the develop
    programs this path feeds). Small arrays (and anything already on
    device) fall back to a plain ``jnp.asarray``; the uploaded values
    are bit-identical either way.
    """
    import jax
    import jax.numpy as jnp

    if _is_device_array(arr):
        return arr
    arr = np.ascontiguousarray(arr)
    nbytes = arr.nbytes
    if bands is None:
        if nbytes < _MIN_PARALLEL_BYTES:
            return jnp.asarray(arr)
        bands = max(1, min(_MAX_UPLOAD_BANDS, nbytes // _BAND_BYTES))
    bands = min(bands, max(1, arr.size))
    if bands <= 1:
        return jnp.asarray(arr)
    threads = min(bands, _MAX_THREADS if threads is None else threads)

    flat = arr.reshape(-1)
    n = flat.shape[0]
    bounds = [n * i // bands for i in range(bands + 1)]

    def one(i):
        return jax.device_put(flat[bounds[i]:bounds[i + 1]])

    with ThreadPoolExecutor(threads) as pool:
        parts = list(pool.map(one, range(bands)))
    return jnp.concatenate(parts).reshape(arr.shape)


def fetch_np(arr, bands: int | None = None, threads: int | None = None
             ) -> np.ndarray:
    """Fetch a device array to the host as np.ndarray via parallel bands.

    The array is viewed flat (row-major reshape is free on device), split
    into ``bands`` contiguous ranges, and each range is fetched in its own
    thread into a preallocated output. Small arrays and non-device inputs
    fall back to a plain ``np.asarray``.
    """
    if not _is_device_array(arr):
        return np.asarray(arr)
    nbytes = arr.size * arr.dtype.itemsize
    if bands is None:
        if nbytes < _MIN_PARALLEL_BYTES:
            return np.asarray(arr)
        bands = max(1, min(_MAX_BANDS, nbytes // _BAND_BYTES))
    bands = min(bands, max(1, arr.size))
    if bands <= 1:
        return np.asarray(arr)
    threads = min(bands, _MAX_THREADS if threads is None else threads)

    # np.dtype(arr.dtype), NOT np.dtype(arr.dtype.name): extended dtypes
    # (bfloat16 from ml_dtypes) are not string-registered with numpy.
    shape, dtype = arr.shape, np.dtype(arr.dtype)
    flat = arr.reshape(-1)
    n = flat.shape[0]
    bounds = [n * i // bands for i in range(bands + 1)]
    out = np.empty(n, dtype=dtype)

    def one(i):
        a, b = bounds[i], bounds[i + 1]
        out[a:b] = np.asarray(flat[a:b])

    with ThreadPoolExecutor(threads) as pool:
        list(pool.map(one, range(bands)))
    return out.reshape(shape)


# Leading prefix-band boundaries (bytes): a short geometric ladder below
# the full band size, so a tiny prefix (the sparse export's escape stream
# is often a few hundred entries on a 75 MB capacity buffer) moves ~64 KB
# instead of a full 8 MB band. The ladder is FIXED, so the device slice
# programs stay keyed on the boundary pair alone and are reused across
# calls with different n — only ~5 extra cached programs per array shape.
_PREFIX_LEAD_BYTES = (64 << 10, 256 << 10, 1 << 20, 2 << 20, 4 << 20)


def _prefix_bounds(n: int, size: int, itemsize: int,
                   band_bytes: int) -> list[int]:
    """Fixed band-boundary schedule covering a prefix of ``n`` elements.

    Boundaries are the geometric lead ladder followed by multiples of the
    band size, truncated at the first boundary >= n (and capped at
    ``size``) — worst-case over-fetch is 2x for small prefixes and one
    band for large ones, while the boundary SET stays independent of n."""
    elems = max(1, band_bytes // itemsize)
    bounds = [0]
    for b in _PREFIX_LEAD_BYTES:
        e = max(1, b // itemsize)
        if e >= elems:
            break
        if bounds[-1] >= n or bounds[-1] >= size:
            break
        if e > bounds[-1]:
            bounds.append(min(e, size))
    k = 1
    while bounds[-1] < n and bounds[-1] < size:
        if k * elems > bounds[-1]:
            bounds.append(min(k * elems, size))
        k += 1
    return bounds


def prefix_fetch_elems(n: int, size: int, itemsize: int,
                       band_bytes: int = _BAND_BYTES) -> int:
    """Elements a ``fetch_np_prefix(arr, n)`` call actually transfers.

    The prefix fetch rounds up to its fixed band schedule; benchmarks
    accounting link traffic must count this, not the trimmed ``n``."""
    n = min(int(n), int(size))
    if n <= 0:
        return 0
    return _prefix_bounds(n, int(size), itemsize, band_bytes)[-1]


def fetch_np_prefix(arr, n: int, band_bytes: int = _BAND_BYTES) -> np.ndarray:
    """Fetch the first ``n`` elements of a device array (viewed flat).

    Band boundaries come from a FIXED schedule (_prefix_bounds), so the
    device slice programs this mints are keyed on the boundary pair alone
    and get reused across calls with different ``n`` — a naive ``arr[:n]``
    would compile a fresh remote program for every distinct n (io/jpegenc's
    sparse export fetches a different true length per image)."""
    n = int(n)
    dtype = np.dtype(arr.dtype)
    n = min(n, int(np.prod(arr.shape, dtype=np.int64)))
    if n <= 0:
        return np.empty((0,), dtype=dtype)
    if not _is_device_array(arr):
        return np.asarray(arr).reshape(-1)[:n]
    flat = arr.reshape(-1)
    size = flat.shape[0]
    bounds = _prefix_bounds(n, size, dtype.itemsize, band_bytes)
    nbands = len(bounds) - 1
    out = np.empty(bounds[-1], dtype=dtype)

    def one(i):
        a, b = bounds[i], bounds[i + 1]
        out[a:b] = np.asarray(flat[a:b])

    if nbands == 1:
        one(0)
    else:
        with ThreadPoolExecutor(min(nbands, _MAX_THREADS)) as pool:
            list(pool.map(one, range(nbands)))
    return out[:n]


# Pre-split band size: finer than the slice-at-fetch-time 8 MB bands
# because pre-split bands are FREE to mint (the split happens inside the
# one compiled producer program, not as per-fetch slice programs), so the
# only cost of finer granularity is per-transfer RTT — which the parallel
# streams hide — while the over-fetch of a prefix drops to half a band.
_PRESPLIT_BAND_BYTES = 4 << 20


def banded_bounds(size: int, itemsize: int,
                  band_bytes: int = _PRESPLIT_BAND_BYTES) -> list[int]:
    """Element boundaries pre-splitting a ``size``-element buffer.

    The geometric lead ladder followed by fixed-size bands, covering the
    WHOLE buffer — the schedule a producing jitted program uses to return
    its output as separate per-band buffers (`tuple(flat[a:b] ...)`
    inside jit), so a later prefix fetch is whole-buffer d2h transfers
    with no device slice program. Boundaries depend only on (size,
    itemsize, band_bytes): trace-time and fetch-time callers agree."""
    if size <= 0:
        return [0]
    return _prefix_bounds(size, size, itemsize, band_bytes)


def banded_fetch_elems(n: int, bounds: list[int]) -> int:
    """Elements a ``fetch_banded(bands, bounds, n)`` call transfers."""
    if n <= 0:
        return 0
    for b in bounds[1:]:
        if b >= n:
            return b
    return bounds[-1]


def fetch_banded(bands, bounds: list[int], n: int,
                 threads: int | None = None) -> np.ndarray:
    """Fetch the first ``n`` elements from pre-split band buffers.

    ``bands`` are SEPARATE device buffers produced by one jitted program
    split at ``bounds`` (see banded_bounds). Fetching a band is a plain
    whole-buffer device->host transfer — no slice program executes on the
    device — so transfers proceed while the device runs the NEXT
    dispatched program instead of queueing behind it (the contention that
    made dispatch-before-fetch 2x slower with slice-at-fetch-time bands).
    Transfers are started asynchronously for every needed band before any
    is awaited."""
    n = int(n)
    if len(bands) != len(bounds) - 1:
        raise ValueError(
            f"got {len(bands)} bands for {len(bounds) - 1} bound pairs")
    if n <= 0 or not bands:
        dtype = np.dtype(bands[0].dtype) if bands else np.uint8
        return np.empty((0,), dtype=dtype)
    n = min(n, bounds[-1])
    k = next(i for i, b in enumerate(bounds[1:]) if b >= n) + 1
    needed = bands[:k]
    for b in needed:
        start = getattr(b, "copy_to_host_async", None)
        if start is not None:
            start()
    if len(needed) == 1:
        return np.asarray(needed[0])[:n]
    threads = min(len(needed), _MAX_THREADS if threads is None else threads)
    with ThreadPoolExecutor(threads) as pool:
        parts = list(pool.map(np.asarray, needed))
    return np.concatenate(parts)[:n]


def start_banded(bands, bounds: list[int], n: int) -> None:
    """Kick off the async d2h transfers fetch_banded(n) will await.

    Callers pipelining exports call this right after the producing
    program's totals arrive, then dispatch the next image's compute, then
    fetch_banded — the transfers ride the link while the device works."""
    n = min(int(n), bounds[-1])
    if n <= 0:
        return
    k = next(i for i, b in enumerate(bounds[1:]) if b >= n) + 1
    for b in bands[:k]:
        start = getattr(b, "copy_to_host_async", None)
        if start is not None:
            start()


@functools.cache
def _to_u8_hwc_jit():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def f(planes):
        u8 = (jnp.clip(planes, 0.0, 1.0) * 255.0).astype(jnp.uint8)
        return u8.transpose(1, 2, 0)

    return f


def fetch_u8_hwc(planes) -> np.ndarray:
    """sRGB f32 planes [3,H,W] in [0,1] -> u8 HWC on the host.

    Device inputs are quantized AND transposed on device (truncating u8
    cast, image.rs:375-383 semantics — XLA's f32->u8 convert truncates
    toward zero exactly like numpy's astype) so the link moves 1
    byte/sample; the host path reproduces the same math for np inputs.
    """
    if _is_device_array(planes):
        return fetch_np(_to_u8_hwc_jit()(planes))
    hwc = np.asarray(planes).transpose(1, 2, 0)
    return (np.clip(hwc, 0.0, 1.0) * 255.0).astype(np.uint8)


@functools.cache
def _to_u16_hwc_jit():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def f(planes):
        u16 = (jnp.clip(planes, 0.0, 1.0) * 65535.0).astype(jnp.uint16)
        return u16.transpose(1, 2, 0)

    return f


def fetch_u16_hwc(planes) -> np.ndarray:
    """sRGB f32 planes [3,H,W] in [0,1] -> u16 HWC on the host — the
    16-bit mirror of fetch_u8_hwc (one cached jitted quantize+transpose
    program, 2 bytes/sample over the link; the previous eager encode_u16
    + host transpose paid separate small remote dispatches per PNG16
    export, ADVICE r3)."""
    if _is_device_array(planes):
        return fetch_np(_to_u16_hwc_jit()(planes))
    hwc = np.asarray(planes).transpose(1, 2, 0)
    return (np.clip(hwc, 0.0, 1.0) * 65535.0).astype(np.uint16)

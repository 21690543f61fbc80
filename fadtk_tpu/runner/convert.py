"""In-memory audio convert for the device pipeline: no filesystem
round-trip for cache misses — decode on host, then Kaiser resample + 16-bit
PCM quantization either on the decode threads (``host`` transport, the
default) or on the accelerator (``device`` transport).

Why an in-memory path at all: the reference converts per file on the host
THROUGH THE FILESYSTEM (fadtk/fad.py:139-160: torchaudio load -> downmix ->
Kaiser resample -> 16-bit wav -> re-read), which is the right thing when
caching is wanted and pure overhead on scoring-only runs.

Why two transports: the device transport (misses ship to the accelerator in
fixed-shape batches — int16 when the source is 16-bit-PCM exact, half the
bytes — the polyphase conv runs on the MXU via dsp/resample.convert_device,
int16 comes back) was designed when the host resample cost ~90 ms per 10 s
clip against 8-25 ms of decode. The round-3 BLAS/FFT host-resampler rewrite
collapsed that premise. On the tunneled axon bench client, where process
RSS also grows with total bytes ever shipped (CLAUDE.md), link bytes are
the scarce resource, and the measured whole-pipeline A/B flipped the
default.

The DEFAULT transport is ``host``: the decode threads run the same BLAS/FFT
polyphase the cache writer uses (3-13 ms per 10 s clip since the round-3
rewrite) so only target-rate int16 ever crosses the link (~0.32 MB vs ~1.5
MB per 10 s 44.1k clip for the device round-trip: source up + int16 down +
embed re-up), and output is bit-identical to the cached path (same
resample_kaiser + float_to_int16 calls, minus the wav write — no resample
LSB wiggle). The round-3 whole-pipeline A/B on the tunneled single-core
bench host measured host transport at 254 vs 130 audio-s/s for the device
round-trip (bench.py --e2e, host_transport_* keys — re-measured each
round); on multi-core PCIe TPU VMs both transports are decode-bound.
``FADTK_TPU_CONVERT_TRANSPORT=device`` restores the device resample
(offloads the polyphase to the MXU — for hosts where CPU, not the link, is
the scarce resource; scores then differ from the cached path by the
documented ~1-LSB wiggle).

Cache semantics: files whose converted wav already exists are read from the
cache (bit-parity with the cached-embedding path); misses are converted
in memory and do NOT write the cache — the device pipeline is the
"no filesystem caches" scoring mode, and keeping the convert cache
exclusively host-produced preserves the bit-parity provenance of the default
path (XLA conv accumulation order differs from host BLAS by ~1 int16 LSB on
~0.1% of samples; see convert_device's docstring).

Exactness properties this module relies on (pinned in tests/test_convert_inmem.py):

- bucket-prefix: resampling a clip zero-padded to a bucket equals resampling
  the exact-length clip on the prefix, bit-for-bit (the polyphase kernel
  zero-pads the tail either way);
- quantization: jnp.round/clip in float32 equals the cache writer's float64
  np.rint/np.clip for all |x| < 2^15 (integers below 2^24 are exact in f32).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Iterator, Sequence

import numpy as np

from ..utils import get_convert_cache_path, next_multiple

#: Pad-bucket grid for miss batches (one compile per (src_sr, bucket) pair).
BUCKET_SECONDS = 10
#: Cap on samples per resample dispatch; rows per batch adapt to the bucket
#: so short clips batch deep while 3-minute clips go one-per-dispatch.
MAX_BATCH_SAMPLES = 1 << 22


def rows_for_bucket(bucket: int, max_rows: int = 8) -> int:
    return max(1, min(max_rows, MAX_BATCH_SAMPLES // max(bucket, 1)))


class _Miss:
    __slots__ = ("index", "mono", "int16", "n")

    def __init__(self, index: int, mono: np.ndarray, int16: np.ndarray | None):
        self.index = index
        self.mono = mono  # float32 (n,) downmixed source
        self.int16 = int16  # int16 view when PCM-exact, else None
        self.n = mono.shape[0]


class ClipLoader:
    """Yield model-ready clips for a file list, converting misses on device.

    Drop-in for the device pipeline's per-file ``fad.load_audio``; output for
    cache hits is identical (same reader), and for misses equals the cached
    path up to the documented resample LSB wiggle.
    """

    def __init__(self, model, workers: int = 8, transport: str | None = None):
        import os

        self.model = model
        self.workers = workers
        self.transport = (
            transport
            if transport is not None
            else os.environ.get("FADTK_TPU_CONVERT_TRANSPORT", "host")
        )
        if self.transport not in ("device", "host"):
            raise ValueError(
                f"FADTK_TPU_CONVERT_TRANSPORT must be 'device' or 'host', "
                f"got {self.transport!r}"
            )

    # ---------------------------------------------------------------- #

    def _probe(self, f: Path):
        """Thread worker: cache hit -> ("hit", prepared); miss -> _Miss parts
        (device transport) or a host-converted hit (host transport)."""
        cache = get_convert_cache_path(self.model.sr, f)
        if cache.exists():
            return ("hit", self.model.load_wav(cache), None, None)
        from ..audio.decode import decode_audio

        x, src_sr = decode_audio(f)  # (channels, n) float32
        if self.transport == "host":
            # Same calls as the cache writer (fad.py load_audio) minus the
            # wav write: bit-identical to the cached path, and only
            # target-rate int16 ever crosses the link.
            from ..audio.wavio import float_to_int16
            from ..dsp.resample import resample_kaiser

            y = resample_kaiser(np.mean(x, axis=0), int(src_sr), self.model.sr)
            return ("hit", self.model.load_wav_array(float_to_int16(y)), None, None)
        mono = np.mean(x, axis=0).astype(np.float32)  # parity: fadtk/fad.py:150
        scaled = mono * 32768.0
        int16 = None
        if (
            scaled.size
            and scaled.min() >= -32768.0
            and scaled.max() <= 32767.0
            and np.array_equal(scaled, np.rint(scaled))
        ):
            int16 = scaled.astype(np.int16)
        return ("miss", mono, int16, int(src_sr))

    def _convert_misses(self, misses: list[tuple[_Miss, int]]) -> dict[int, np.ndarray]:
        """Batch-resample misses on device; returns {index: int16 mono}."""
        import jax.numpy as jnp

        from ..dsp.resample import convert_device, resampled_length

        out: dict[int, np.ndarray] = {}
        by_shape: dict[tuple[int, int], list[_Miss]] = {}
        for m, src_sr in misses:
            if src_sr == self.model.sr and m.int16 is not None:
                # Already at rate and 16-bit exact: the convert transform is
                # the identity; no dispatch.
                out[m.index] = m.int16
                continue
            bucket = next_multiple(m.n, BUCKET_SECONDS * src_sr)
            by_shape.setdefault((src_sr, bucket), []).append(m)

        for (src_sr, bucket), group in by_shape.items():
            rows = rows_for_bucket(bucket)
            ship_int16 = all(m.int16 is not None for m in group)
            dtype = np.int16 if ship_int16 else np.float32
            for s in range(0, len(group), rows):
                batch = group[s : s + rows]
                x = np.zeros((rows, bucket), dtype)
                for j, m in enumerate(batch):
                    x[j, : m.n] = m.int16 if ship_int16 else m.mono
                q = np.asarray(
                    convert_device(jnp.asarray(x), src_sr, self.model.sr)
                )
                for j, m in enumerate(batch):
                    out[m.index] = q[j, : resampled_length(m.n, src_sr, self.model.sr)]
        return out

    # ---------------------------------------------------------------- #

    def iter_clips(self, files: Sequence[Path]) -> Iterator[np.ndarray]:
        """Model-ready arrays in file order, windows overlapping host decode
        (threads) with device resample; host RAM stays O(window)."""
        window = max(4 * self.workers, 8)
        with ThreadPoolExecutor(max_workers=self.workers) as ex:
            for start in range(0, len(files), window):
                chunk = files[start : start + window]
                probed = list(ex.map(self._probe, chunk))
                misses = [
                    (_Miss(i, mono, int16), src_sr)
                    for i, (kind, mono, int16, src_sr) in enumerate(probed)
                    if kind == "miss"
                ]
                converted = self._convert_misses(misses) if misses else {}
                for i, (kind, payload, _, _) in enumerate(probed):
                    if kind == "hit":
                        yield payload
                    else:
                        yield self.model.load_wav_array(converted[i])

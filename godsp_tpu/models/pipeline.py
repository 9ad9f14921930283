"""Flagship end-to-end pipeline: WAV stream -> distributed Welch PSD.

Composes the full stack the way a production deployment does (the
reference leaves this composition to user code — wav/ is not imported by
any other package, SURVEY.md §1):

  wav.Wav.blocks (host I/O, reference ReadSamples streaming semantics)
    -> parallel.StreamingPwelch (sharded halo-exchange Pwelch with
       checkpoint/resume and metrics)
    -> (Pxx, freqs) + run metrics

Also provides spectrogram_from_wav for the STFT model family.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np
from jax.sharding import Mesh

from godsp_tpu import wav as wavmod
from godsp_tpu.parallel.streaming import StreamingPwelch
from godsp_tpu.spectral.pwelch import PwelchOptions

__all__ = ["WavPsdResult", "wav_psd", "spectrogram_from_wav"]


@dataclass
class WavPsdResult:
    pxx: np.ndarray
    freqs: np.ndarray
    sample_rate: int
    samples: int
    metrics_json: str


def wav_psd(
    src,
    options: Optional[PwelchOptions] = None,
    mesh: Optional[Mesh] = None,
    block_size: int = 1 << 20,
    checkpoint_path: Optional[str] = None,
    checkpoint_every_chunks: int = 0,
    segs_per_chunk_shard: int = 256,
) -> WavPsdResult:
    """Welch PSD of a WAV file/stream, streamed block-by-block.

    src: path, bytes, or binary stream.  fs is taken from the WAV header.
    The signal never fully materializes on the host: fixed-size blocks
    stream from the reader into the sharded device step (halo exchange +
    psum), with optional periodic checkpointing for resumable multi-hour
    runs (SURVEY.md §5).
    """
    w = wavmod.read_wav(src)
    sp = StreamingPwelch(
        float(w.sample_rate),
        options,
        mesh,
        segs_per_chunk_shard=segs_per_chunk_shard,
        checkpoint_path=checkpoint_path,
        checkpoint_every_chunks=checkpoint_every_chunks,
    )
    for block in w.blocks(block_size):
        sp.update(block)
    pxx, freqs = sp.finalize()
    return WavPsdResult(
        pxx=pxx,
        freqs=freqs,
        sample_rate=w.sample_rate,
        samples=w.samples,
        metrics_json=sp.metrics.json_line(),
    )


def spectrogram_from_wav(
    src,
    nfft: int = 1024,
    hop: Optional[int] = None,
    window=None,
    scale: str = "power",
    max_samples: Optional[int] = None,
):
    """(spectrogram, freqs, frame_times) of a WAV file.

    Reads up to max_samples (default: all) into one device batch; for
    hours-long inputs use wav_psd's streaming path instead.
    """
    from godsp_tpu.models.stft import spectrogram

    w = wavmod.read_wav(src)
    n = w.samples if max_samples is None else min(w.samples, max_samples)
    x = w.read_floats(n)
    hop = hop or nfft // 2
    s = spectrogram(x, nfft, hop, window, scale=scale)
    freqs = np.arange(nfft // 2 + 1) * (w.sample_rate / nfft)
    n_frames = (n - nfft) // hop + 1
    times = (np.arange(n_frames) * hop + nfft / 2) / w.sample_rate
    return s, freqs, times

"""Audio -> batched sliding windows (reference:
``osuT5/osuT5/inference/preprocessor.py:11-102``).

Windows of ``(src_seq_len-1)*hop_length`` samples slide with stride
``(1-lookback-lookahead)*window`` (full window in parallel mode). Pure
host-side numpy; the device sees only the final (num_windows, samples)
float32 array, so a whole song becomes one batched mel+encoder call.
"""

from __future__ import annotations

import numpy as np

from ..audio.io import load_audio_file

MILLISECONDS_PER_SECOND = 1000


class Preprocessor:
    def __init__(self, args, parallel: bool = False):
        data = args.train.data
        self.frame_seq_len = data.src_seq_len - 1
        self.frame_size = data.hop_length
        self.sample_rate = data.sample_rate
        self.normalize_audio = data.normalize_audio
        self.parallel = parallel

        self.samples_per_sequence = self.frame_seq_len * self.frame_size
        overlap = 0.0 if parallel else args.lookback + args.lookahead
        self.sequence_stride = int(self.samples_per_sequence * (1 - overlap))

        ms_per_sample = MILLISECONDS_PER_SECOND / self.sample_rate
        self.milliseconds_per_stride = self.sequence_stride * ms_per_sample
        self.milliseconds_per_sequence = self.samples_per_sequence * ms_per_sample
        self.lookback_max_time = args.lookback * self.milliseconds_per_sequence
        self.lookahead_max_time = (1 - args.lookahead) * self.milliseconds_per_sequence
        self.start_time = args.start_time
        self.end_time = args.end_time

    def load(self, path: str) -> np.ndarray:
        return load_audio_file(path, self.sample_rate, normalize=self.normalize_audio)

    def segment(self, samples: np.ndarray, begin_pad: int = 0, end_pad: int = 0):
        """Returns (sequences (N, samples_per_sequence) f32,
        sequence_times (N,) int32 ms, song_length ms)."""
        song_length = len(samples) * MILLISECONDS_PER_SECOND / self.sample_rate

        # right-pad so the strided view tiles the song exactly
        padded_len = len(samples) + begin_pad + end_pad
        if padded_len < self.samples_per_sequence:
            total = self.samples_per_sequence
        else:
            n_strides = -(-(padded_len - self.samples_per_sequence) // self.sequence_stride)
            total = self.samples_per_sequence + n_strides * self.sequence_stride
        samples = np.pad(samples, [begin_pad, total - len(samples) - begin_pad])

        view = np.lib.stride_tricks.sliding_window_view(samples, self.samples_per_sequence)
        sequences = view[:: self.sequence_stride].astype(np.float32)
        sequence_times = (np.arange(len(sequences)) * self.milliseconds_per_stride).astype(np.int32)

        sequences, sequence_times = self._trim(sequences, sequence_times)
        return sequences, sequence_times, song_length

    def _trim(self, sequences, sequence_times):
        """Drop windows fully outside the requested [start_time, end_time]."""
        if self.start_time is not None:
            lo = int(np.searchsorted(sequence_times, self.start_time - self.lookahead_max_time, side="right"))
            lo = min(lo, len(sequence_times) - 1)
            sequences, sequence_times = sequences[lo:], sequence_times[lo:]
        if self.end_time is not None:
            hi = int(np.searchsorted(sequence_times, self.end_time - self.lookback_max_time, side="left"))
            hi = max(hi, 1)
            sequences, sequence_times = sequences[:hi], sequence_times[:hi]
        return sequences, sequence_times

from .io import load_audio_file  # noqa: F401
from .mel import MelSpectrogram, mel_filterbank  # noqa: F401

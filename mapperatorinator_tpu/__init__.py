"""TPU-native (JAX/XLA/Pallas/pjit) framework with the capabilities of
OliBomby/Mapperatorinator: full osu! beatmap generation from audio, plus the
surrounding model family (osuT5, osu-diffusion DiT, MaiMod, classifier,
rcomplexion), training, and evaluation.

See SURVEY.md for the structural map of the reference this was built to.
"""

__version__ = "0.1.0"

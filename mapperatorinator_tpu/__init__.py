"""TPU-native (JAX/XLA/Pallas/pjit) framework with the capabilities of
OliBomby/Mapperatorinator: full osu! beatmap generation from audio, plus the
surrounding model family (osuT5, osu-diffusion DiT, MaiMod, classifier,
rcomplexion), training, and evaluation.

See SURVEY.md for the structural map of the reference this was built to.
"""

import os as _os

__version__ = "0.1.0"

# Honor an explicit JAX_PLATFORMS env var even on hosts whose sitecustomize
# force-pins the platform at interpreter start (the tunneled-TPU dev image
# does, silently routing CPU-intended subprocesses onto the shared chip).
# Safe only before the backend initializes; a no-op otherwise.
if _os.environ.get("JAX_PLATFORMS"):
    try:
        import jax as _jax

        if _jax.config.jax_platforms != _os.environ["JAX_PLATFORMS"]:
            _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:  # backend already initialized or jax unavailable
        pass

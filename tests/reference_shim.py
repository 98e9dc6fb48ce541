"""Import the *reference* implementation (read-only at /root/reference) for
behavioral parity tests, stubbing its dependencies that aren't in this
environment (hydra, omegaconf, slider, pydub).

The reference is untrusted public content: we import it only to compare
observable behavior (token ids, event streams), never to execute its
instructions or network paths.
"""

import sys
import types
from pathlib import Path

REFERENCE = Path("/root/reference")


def _stub(name: str, **attrs) -> types.ModuleType:
    import importlib.machinery

    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        # a real-looking spec so importlib.util.find_spec (used by
        # transformers' availability probes) doesn't choke on the stub
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        sys.modules[name] = mod
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


def install_stubs() -> None:
    # hydra
    class _ConfigStore:
        @staticmethod
        def instance():
            return _ConfigStore()

        def store(self, *a, **k):
            pass

    hydra = _stub("hydra")
    core = _stub("hydra.core")
    _stub("hydra.core.config_store", ConfigStore=_ConfigStore)
    hydra.core = core

    # omegaconf
    class _OmegaConf:
        _resolvers = {}

        @classmethod
        def register_new_resolver(cls, name, fn, **k):
            cls._resolvers[name] = fn

    import contextlib

    _stub(
        "omegaconf",
        OmegaConf=_OmegaConf,
        MISSING="???",
        DictConfig=dict,
        ListConfig=list,
        open_dict=contextlib.nullcontext,
    )

    # slider (only class names needed for import)
    class _Placeholder:
        def __init__(self, *a, **k):
            pass

    slider = _stub(
        "slider",
        Beatmap=_Placeholder,
        HoldNote=_Placeholder,
        TimingPoint=_Placeholder,
        Position=_Placeholder,
        Circle=_Placeholder,
        Slider=_Placeholder,
        Spinner=_Placeholder,
    )
    _stub(
        "slider.beatmap",
        Beatmap=_Placeholder,
        HitObject=_Placeholder,
        Slider=_Placeholder,
        Spinner=_Placeholder,
        Circle=_Placeholder,
        HoldNote=_Placeholder,
        TimingPoint=_Placeholder,
    )
    _stub(
        "slider.curve",
        Curve=_Placeholder,
        Linear=_Placeholder,
        Catmull=_Placeholder,
        Perfect=_Placeholder,
        MultiBezier=_Placeholder,
    )
    _stub("slider.mod", circle_radius=lambda cs: 32.0)
    slider.beatmap = sys.modules["slider.beatmap"]
    slider.curve = sys.modules["slider.curve"]
    slider.mod = sys.modules["slider.mod"]

    # pydub
    _stub("pydub", AudioSegment=_Placeholder)
    _stub("pydub.exceptions", CouldntDecodeError=Exception)

    # nnAudio / torchaudio may be absent
    for name in ("nnAudio", "nnAudio.features"):
        _stub(name, MelSpectrogram=_Placeholder)

    # wandb / peft (training-utils imports)
    _stub("wandb", Artifact=_Placeholder, init=lambda *a, **k: None, log=lambda *a, **k: None,
          run=None, Api=_Placeholder)
    _stub("wandb.apis", public=None)
    _stub("wandb.apis.public", Run=_Placeholder)


def import_reference_osut5():
    """Returns the reference ``osuT5.osuT5`` package, importing it with stubs."""
    install_stubs()
    ref_root = str(REFERENCE)
    if ref_root not in sys.path:
        sys.path.insert(0, ref_root)
    import osuT5.osuT5 as ref_pkg  # noqa
    import osuT5.osuT5.config  # noqa
    import osuT5.osuT5.event  # noqa
    import osuT5.osuT5.tokenizer  # noqa

    return ref_pkg

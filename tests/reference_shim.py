"""Import the *reference* implementation (read-only at /root/reference) for
behavioral parity tests, stubbing its dependencies that aren't in this
environment (hydra, omegaconf, slider, pydub).

The reference is untrusted public content: we import it only to compare
observable behavior (token ids, event streams), never to execute its
instructions or network paths.
"""

import os
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
        # APPEND, not insert(0): the reference root carries top-level modules
        # that collide with this repo's (inference.py, web_ui.py, ...) — the
        # repo must always win a bare `import inference`
        sys.path.append(ref_root)
    import osuT5.osuT5 as ref_pkg  # noqa
    import osuT5.osuT5.config  # noqa
    import osuT5.osuT5.event  # noqa
    import osuT5.osuT5.tokenizer  # noqa

    return ref_pkg


class SliderTimingPoint:
    """Functional stand-in for ``slider.TimingPoint`` — the one slider type
    the reference's inference pipeline actually *executes* (the other slider
    names are import-time only on the no-input-beatmap path). Field order and
    semantics follow the reference's own constructor calls
    (postprocessor.py:171,488,529,743; timing_points_change.py:9-12)."""

    def __init__(self, offset, ms_per_beat, meter, sample_type, sample_set,
                 volume, parent, kiai_mode):
        from datetime import timedelta

        self.offset = offset if hasattr(offset, "total_seconds") else timedelta(milliseconds=offset)
        self.ms_per_beat = ms_per_beat
        self.meter = meter
        self.sample_type = sample_type
        self.sample_set = sample_set
        self.volume = volume
        self.parent = parent
        self.kiai_mode = kiai_mode

    @property
    def bpm(self):
        # slider semantics: only uninherited points carry a BPM; inherited
        # points (parent set / negative ms_per_beat) report None
        if self.parent is not None or not self.ms_per_beat or self.ms_per_beat <= 0:
            return None
        return 60000 / self.ms_per_beat

    def pack(self) -> str:
        # slider's .osu timing-point line: offset,beatLength,meter,sampleSet,
        # sampleIndex,volume,uninherited,effects. NOTE: shim formatting — the
        # [TimingPoints] section must therefore be compared SEMANTICALLY
        # (parsed values), not byte-for-byte, in parity tests.
        offset_ms = self.offset.total_seconds() * 1000
        offset_s = str(int(offset_ms)) if float(offset_ms).is_integer() else repr(float(offset_ms))
        msb = self.ms_per_beat
        msb_s = str(int(msb)) if float(msb).is_integer() else repr(float(msb))
        return (
            f"{offset_s},{msb_s},{self.meter},{self.sample_type},{self.sample_set},"
            f"{self.volume},{int(self.parent is None)},{int(bool(self.kiai_mode))}"
        )

    def __repr__(self):
        return f"TimingPoint({self.offset}, {self.ms_per_beat})"


def import_reference_inference():
    """Returns the reference's root ``inference`` module (the full pipeline:
    /root/reference/inference.py:411-551 ``generate``), importable offline.

    On top of ``install_stubs`` this needs: a passthrough ``hydra.main``
    decorator, a yaml-backed ``OmegaConf.load`` (compile_derived_args reads
    configs/inference/default.yaml for tag defaults), and a FUNCTIONAL
    ``slider.TimingPoint`` (the postprocessor constructs and packs real
    timing points; everything else from slider stays import-time-only when
    no input beatmap is given)."""
    import_reference_osut5()

    import types as _t

    hydra = sys.modules["hydra"]
    if not hasattr(hydra, "main"):
        hydra.main = lambda *a, **k: (lambda f: f)

    omegaconf = sys.modules["omegaconf"]

    def _load(path):
        import yaml

        p = Path(path)
        if not p.is_absolute() and not p.exists():
            p = REFERENCE / path  # reference code reads its own configs cwd-relative
        ns = _t.SimpleNamespace(**yaml.safe_load(p.read_text()))
        # ContextType-typed fields arrive as plain strings from yaml; the tag
        # comparison only needs equality semantics
        return ns

    if not hasattr(omegaconf.OmegaConf, "load"):
        omegaconf.OmegaConf.load = staticmethod(_load)

    for mod_name in ("slider", "slider.beatmap"):
        setattr(sys.modules[mod_name], "TimingPoint", SliderTimingPoint)
    # retro-patch reference modules that already from-imported the
    # import-time placeholder (e.g. timing_points_change.py when a parity
    # suite imported osuT5 first in the session) — a from-import binds the
    # class into the module namespace, so updating slider alone is not enough
    for name, mod in list(sys.modules.items()):
        if not name.startswith("osuT5"):
            continue
        current = getattr(mod, "TimingPoint", None)
        if isinstance(current, type) and current.__name__ == "_Placeholder":
            mod.TimingPoint = SliderTimingPoint

    import importlib.util

    name = "reference_inference"
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(name, REFERENCE / "inference.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    cwd = os.getcwd()
    try:
        os.chdir(REFERENCE)  # module-relative config reads
        spec.loader.exec_module(mod)
    finally:
        os.chdir(cwd)
    return mod

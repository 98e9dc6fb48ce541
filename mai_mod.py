"""MaiMod — AI modding assistant CLI (reference: ``mai_mod.py:24-389``).

Runs the teacher-forced surprisal analysis over a finished beatmap and
renders human-readable, categorized suggestions with osu://edit timestamps.

    python mai_mod.py beatmap_path=map.osu audio_path=audio.mp3 [raw_output=true]
"""

from __future__ import annotations

import sys
import warnings
from dataclasses import dataclass
from pathlib import Path
from string import Template
from typing import Optional

warnings.filterwarnings("ignore")

REPO_ROOT = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO_ROOT))

from mapperatorinator_tpu.config import compose, schema
from mapperatorinator_tpu.osu import Beatmap, ContextType, Event, EventType
from mapperatorinator_tpu.osu.beatmap import Spinner
from mapperatorinator_tpu.osu.streams import Group, get_groups

# (real, expected) event-type pairs -> (category, explanation template)
# Designed for V30-style tokenization (reference: mai_mod.py:24-51).
MOD_EXPLANATIONS = {
    (EventType.DISTANCE, EventType.DISTANCE): ("Compose", "Expected distance $expected_value to the previous $previous_group instead of $real_value."),
    (EventType.POS_X, EventType.POS_X): ("Compose", "Expected position $expected_value instead of $real_value."),
    (EventType.POS_Y, EventType.POS_Y): ("Compose", "Expected position $expected_value instead of $real_value."),
    (EventType.POS, EventType.POS): ("Compose", "Expected position $expected_value instead of $real_value."),
    (EventType.MANIA_COLUMN, EventType.MANIA_COLUMN): ("Compose", "Expected column $expected_value instead of $real_value."),
    (EventType.HITSOUND, EventType.HITSOUND): ("Hit Sounds", "Expected hitsound $expected_value instead of $real_value."),
    (EventType.VOLUME, EventType.VOLUME): ("Hit Sounds", "Expected volume $expected_value instead of $real_value."),
    (EventType.HITSOUND, EventType.NEW_COMBO): ("New Combos", "Expected new combo."),
    (EventType.NEW_COMBO, EventType.HITSOUND): ("New Combos", "Unexpected new combo."),
    (EventType.HITSOUND, EventType.LAST_ANCHOR): ("Rhythm", "Expected end of slider repeats."),
    (EventType.HITSOUND, EventType.SLIDER_END): ("Rhythm", "Expected end of slider repeats."),
    (EventType.SNAPPING, EventType.BEAT): ("Timing", "Hit object likely not snapped to a beat."),
    (EventType.SNAPPING, EventType.MEASURE): ("Timing", "Hit object likely not snapped to a beat."),
    (EventType.SNAPPING, EventType.TIMING_POINT): ("Timing", "Hit object likely not snapped to a beat."),
    (EventType.TIME_SHIFT, EventType.DISTANCE): ("Sliders", "Expected additional anchors."),
    (EventType.DISTANCE, EventType.TIME_SHIFT): ("Sliders", "Expected last anchor."),
    (EventType.BEAT, EventType.SNAPPING): ("Timing", "Unexpected beat."),
    (EventType.BEAT, EventType.MEASURE): ("Timing", "Expected new measure."),
    (EventType.BEAT, EventType.TIMING_POINT): ("Timing", "Expected new timing point."),
    (EventType.MEASURE, EventType.SNAPPING): ("Timing", "Unexpected new measure."),
    (EventType.MEASURE, EventType.BEAT): ("Timing", "Unexpected new measure."),
    (EventType.MEASURE, EventType.TIMING_POINT): ("Timing", "Expected new timing point."),
    (EventType.TIMING_POINT, EventType.SNAPPING): ("Timing", "Unexpected new timing point."),
    (EventType.TIMING_POINT, EventType.BEAT): ("Timing", "Unexpected new timing point."),
    (EventType.TIMING_POINT, EventType.MEASURE): ("Timing", "Unexpected new timing point."),
}

POSITION_TYPES = [EventType.DISTANCE, EventType.POS_X, EventType.POS_Y, EventType.POS]
ANCHOR_TYPES = [EventType.RED_ANCHOR, EventType.BEZIER_ANCHOR, EventType.CATMULL_ANCHOR, EventType.PERFECT_ANCHOR]
HS_TYPES = [EventType.HITSOUND, EventType.VOLUME]
TIMING_TYPES_ = [EventType.BEAT, EventType.MEASURE, EventType.TIMING_POINT]
HITOBJECT_TYPES = [
    EventType.CIRCLE, EventType.SPINNER, EventType.SPINNER_END, EventType.SLIDER_HEAD,
    EventType.BEZIER_ANCHOR, EventType.PERFECT_ANCHOR, EventType.CATMULL_ANCHOR, EventType.RED_ANCHOR,
    EventType.LAST_ANCHOR, EventType.SLIDER_END, EventType.HOLD_NOTE, EventType.HOLD_NOTE_END,
    EventType.DRUMROLL, EventType.DRUMROLL_END, EventType.DENDEN, EventType.DENDEN_END,
]


@dataclass
class Suggestion:
    context_type: ContextType
    index: int
    time: float
    group: Group
    group_str: str
    previous_group_str: str
    next_group: Optional[Group]
    next_beat_group: Optional[Group]
    event: Event
    event_str: str
    expected_event: Event
    expected_event_str: str
    surprisal: float
    combo_index: Optional[int] = None
    timestamp_time: Optional[float] = None


def type_to_str(event_type: EventType) -> str:
    return event_type.value.replace("_", " ").title()


def ai_mod(
    args,
    *,
    generation_config,
    engine,
    vocab,
    audio_path: Optional[str] = None,
    beatmap_path: Optional[str] = None,
    verbose: bool = True,
    raw_output: bool = False,
    surprisal_threshold: float = 20.0,
    structured: bool = False,
):
    from mapperatorinator_tpu.infer import Preprocessor, Processor

    i_args = args.inference if hasattr(args, "inference") else args
    audio_path = i_args.audio_path if audio_path is None else audio_path
    beatmap_path = i_args.beatmap_path if beatmap_path is None else beatmap_path

    if not Path(audio_path).is_file():
        raise FileNotFoundError(f"Provided audio file path does not exist: {audio_path}")
    if beatmap_path and not Path(beatmap_path).is_file():
        raise FileNotFoundError(f"Provided beatmap file path does not exist: {beatmap_path}")

    preprocessor = Preprocessor(i_args, parallel=False)
    processor = Processor(i_args, engine, vocab)

    audio = preprocessor.load(audio_path)
    sequences = preprocessor.segment(audio)

    result = processor.ai_mod(
        sequences=sequences,
        generation_config=generation_config,
        beatmap_path=beatmap_path,
        verbose=verbose,
    )

    suggestions: list[Suggestion] = []
    for context in result:
        groups, group_indices = get_groups(
            context["events"], event_times=context["event_times"], types_first=i_args.train.data.types_first
        )
        event_groups = [0] * len(context["events"])
        for group_index, indices in enumerate(group_indices):
            for index in indices:
                event_groups[index] = group_index

        context_suggestions = [
            Suggestion(context["context_type"], *z)
            for z in zip(
                range(len(context["events"])),
                context["event_times"],
                [groups[event_groups[i]] for i in range(len(context["events"]))],
                ["None"] * len(context["events"]),
                ["None"] * len(context["events"]),
                [
                    groups[event_groups[i] + 1] if event_groups[i] + 1 < len(groups) else None
                    for i in range(len(context["events"]))
                ],
                [None] * len(context["events"]),
                context["events"],
                context["events_str"],
                context["expected_events"],
                context["expected_events_str"],
                context["surprisals"],
                [None] * len(context["events"]),
                [None] * len(context["events"]),
            )
        ]

        def get_group_str(group_index: int, s: Suggestion) -> str:
            if group_index < 0 or group_index >= len(groups):
                return "None"
            group = groups[group_index]
            if group.event_type == EventType.LAST_ANCHOR and group_index == event_groups[s.index] and s.event.type in HS_TYPES:
                repeat_index = 0
                for j in range(s.index - 1, -1, -1):
                    if context["events"][j].type == EventType.TIME_SHIFT:
                        break
                    if context["events"][j].type == s.event.type:
                        repeat_index += 1
                return "Slider Body" if repeat_index == 0 else f"Slider Repeat #{repeat_index}"
            if group.event_type in ANCHOR_TYPES:
                anchor_index = 2
                for j in range(group_index - 1, -1, -1):
                    if groups[j].event_type == EventType.SLIDER_HEAD:
                        break
                    if groups[j].event_type in ANCHOR_TYPES:
                        anchor_index += 1
                return f"{type_to_str(group.event_type)} #{anchor_index}"
            return type_to_str(group.event_type)

        def get_next_beat_group(s: Suggestion) -> Optional[Group]:
            for i in range(event_groups[s.index] + 1, len(groups)):
                if groups[i].event_type in TIMING_TYPES_:
                    return groups[i]
            return None

        for s in context_suggestions:
            group_index = event_groups[s.index]
            s.group_str = get_group_str(group_index, s)
            s.next_beat_group = get_next_beat_group(s)
            for i in range(group_index - 1, -1, -1):
                if groups[i].x is not None:
                    s.previous_group_str = get_group_str(i, s)
                    break

        suggestions.extend(context_suggestions)

    suggestions.sort(key=lambda x: x.time)

    suggestions = [
        s
        for s in suggestions
        if (
            s.surprisal >= surprisal_threshold
            and not (s.group.event_type == EventType.SLIDER_END and s.event.type in POSITION_TYPES)
            and not (
                s.event.type == EventType.TIME_SHIFT
                and s.expected_event.type == EventType.TIME_SHIFT
                and abs(s.expected_event.value - s.event.value) <= 10
            )
            and not (
                s.event.type == EventType.SNAPPING
                and s.expected_event.type in TIMING_TYPES_
                and s.next_group
                and abs(s.time - s.next_group.time) < 2
            )
            and not (
                s.event.type in TIMING_TYPES_
                and s.expected_event.type == EventType.SNAPPING
                and s.next_group
                and abs(s.time - s.next_group.time) < 2
            )
        )
    ]

    # combo-indexed osu://edit timestamps
    beatmap = Beatmap.from_path(beatmap_path)
    hitobjects = beatmap.hit_objects(stacking=False)
    for s in suggestions:
        if s.group.event_type not in HITOBJECT_TYPES:
            continue
        combo_index = 0
        for i, ho in enumerate(hitobjects):
            if ho.time - 1 > s.time and i > 0:
                s.combo_index = combo_index
                s.timestamp_time = int(hitobjects[i - 1].time + 1e-5)
                break
            combo_index += 1
            if (
                ho.new_combo
                or isinstance(ho, Spinner)
                or (i > 0 and isinstance(hitobjects[i - 1], Spinner))
                or (i > 0 and ho.time - hitobjects[i - 1].time > 10000)
            ):
                combo_index = 1
        if combo_index > 0 and s.combo_index is None:
            s.combo_index = combo_index
            s.timestamp_time = int(hitobjects[-1].time + 1e-5)

    def timestamp_text(s: Suggestion) -> str:
        t = int(s.time)
        t2 = int(s.timestamp_time) if s.timestamp_time is not None else t
        timestamp = f"{t // 60000:02}:{(t // 1000) % 60:02}:{t % 1000:03}"
        url = f"osu://edit/{t2 // 60000:02}:{(t2 // 1000) % 60:02}:{t2 % 1000:03}"
        if s.combo_index is not None:
            url += f"%20({s.combo_index})"
        return f"[link={url}][green]{timestamp}[/green][/link]"

    def surprisal_text(surprisal: float) -> str:
        surprisal /= 10.0
        if surprisal >= 10000:
            return f"[bold red]({surprisal:.0f})[/bold red]"
        if surprisal >= 1000:
            return f" [bold red]({surprisal:.0f})[/bold red]"
        if surprisal >= 100:
            return f"  [bold red]({surprisal:.0f})[/bold red]"
        if surprisal >= 10:
            return f"   [bold yellow]({surprisal:.0f})[/bold yellow]"
        if surprisal >= 1:
            return f"    [bold]({surprisal:.0f})[/bold]"
        return f"    ({surprisal:.0f})"

    suggestions_by_category: dict[str, list[str]] = {}
    records: list[dict] = []
    for s in suggestions:
        if (
            i_args.train.data.add_timing
            and s.event.type == EventType.TIME_SHIFT
            and s.expected_event.type == EventType.TIME_SHIFT
            and s.group.event_type not in TIMING_TYPES_
            and s.next_beat_group
            and abs(s.expected_event.value - s.next_beat_group.time) <= 10
        ):
            category, template = ("Rhythm", "Unexpected hit object.")
        elif s.event.type == EventType.LAST_ANCHOR and s.expected_event.type in ANCHOR_TYPES:
            category, template = ("Sliders", "Expected additional anchors.")
        elif s.event.type in ANCHOR_TYPES and s.expected_event.type == EventType.LAST_ANCHOR:
            category, template = ("Sliders", "Expected last anchor.")
        elif s.event.type in ANCHOR_TYPES and s.expected_event.type in ANCHOR_TYPES:
            category, template = ("Sliders", "Expected a $expected_type instead of a $real_type.")
        elif s.event.type in HITOBJECT_TYPES and s.expected_event.type in HITOBJECT_TYPES:
            category, template = ("Rhythm", "Expected a $expected_type instead of a $real_type.")
        elif s.event.type in (EventType.TIME_SHIFT, EventType.SNAPPING) and s.expected_event.type == s.event.type:
            if s.event.type == EventType.TIME_SHIFT:
                template = "Expected object at $expected_value instead of $real_value."
            else:
                template = "Expected snapping $expected_value instead of $real_value."
            if s.group.event_type in HITOBJECT_TYPES:
                category = "Rhythm"
            elif s.group.event_type == EventType.SCROLL_SPEED_CHANGE:
                category = "Scroll Speeds"
            elif s.group.event_type == EventType.KIAI:
                category = "Kiai"
            else:
                category = "Timing"
        elif s.event.type == EventType.SCROLL_SPEED and s.expected_event.type == EventType.SCROLL_SPEED:
            if beatmap.mode == 0:
                category, template = ("Sliders", "Expected slider velocity $expected_value instead of $real_value.")
            else:
                category, template = ("Scroll Speeds", "Expected scroll speed $expected_value instead of $real_value.")
        elif s.expected_event.type == EventType.CONTROL:
            if s.event.type == EventType.KIAI:
                if s.event.value == 1:
                    category, template = ("Kiai", "Unexpected kiai section start.")
                else:
                    category, template = ("Kiai", "Unexpected kiai section end.")
            else:
                category, template = ("Timing", "Expected end of beatmap.")
        else:
            category, template = MOD_EXPLANATIONS.get(
                (s.event.type, s.expected_event.type),
                ("Misc", "Expected $expected_type $expected_value instead of $real_type $real_value."),
            )

        explanation = Template(template).safe_substitute(
            {
                "expected_value": s.expected_event_str,
                "real_value": s.event_str,
                "expected_type": type_to_str(s.expected_event.type),
                "real_type": type_to_str(s.event.type),
                "group": s.group_str,
                "previous_group": s.previous_group_str,
            }
        )
        suggestions_by_category.setdefault(category, []).append(
            f"{surprisal_text(s.surprisal)} {timestamp_text(s)} ({s.group_str}) - {explanation}"
        )
        t = int(s.time)
        t2 = int(s.timestamp_time) if s.timestamp_time is not None else t
        edit_link = f"osu://edit/{t2 // 60000:02}:{(t2 // 1000) % 60:02}:{t2 % 1000:03}"
        if s.combo_index is not None:
            edit_link += f"%20({s.combo_index})"
        records.append({
            "category": category,
            "message": explanation,
            "surprisal": float(s.surprisal) / 10.0,
            "timestamp": f"{t // 60000:02}:{(t // 1000) % 60:02}:{t % 1000:03}",
            "edit_link": edit_link,
            "group": s.group_str,
        })

    p = print
    if not raw_output:
        try:
            from rich.console import Console

            p = Console(width=900).print
        except ImportError:
            pass

    p(
        "The first value between parentheses represents the importance of the suggestion. "
        "Values above [red]100[/red] are likely issues, whereas values below 10 are likely subjective"
    )
    p(f"Found {len(suggestions)} suggestions:")
    for category in sorted(suggestions_by_category):
        print(f"\n{category}:")
        for item in suggestions_by_category[category][:10]:
            p(f" {item}")

    if structured:
        return records
    return suggestions_by_category


def select_config_for_gamemode(i_args, fallback: str = "v31", verbose: bool = True,
                               overrides: Optional[list] = None):
    """When the beatmap's gamemode is not among the config's trained
    gamemodes, fall back to the v31 inference preset, which covers all four
    modes (reference: mai_mod.py:337-360). User-facing paths and the seed
    carry over, and any explicit ``inference.*`` CLI ``overrides`` are
    re-applied on the fallback compose; everything else takes the fallback
    preset's defaults."""
    beatmap_path = i_args.beatmap_path
    if not beatmap_path:
        return i_args
    beatmap_path = Path(beatmap_path)
    if not beatmap_path.is_file():
        raise FileNotFoundError(f"Provided beatmap file path does not exist: {beatmap_path}")
    if beatmap_path.suffix.lower() != ".osu":
        raise ValueError(f"Beatmap file must have .osu extension: {beatmap_path}")
    mode = Beatmap.from_path(beatmap_path).mode
    if mode in i_args.train.data.gamemodes:
        return i_args
    if verbose:
        print(f"Gamemode {mode} is not supported by the selected config; falling back to {fallback}")
    inference_overrides = [
        o.split("inference.", 1)[1] for o in (overrides or []) if o.startswith("inference.")
    ]
    new_args = compose(
        REPO_ROOT / "configs" / "inference", fallback,
        overrides=inference_overrides, schema_cls=schema.InferenceConfig,
    )
    for key in ("beatmap_path", "audio_path", "output_path", "precision", "seed"):
        setattr(new_args, key, getattr(i_args, key))
    new_args.gamemode = mode
    return new_args


def run_analysis(i_args, surprisal_threshold: float = 20.0) -> list[dict]:
    """Programmatic MaiMod entry for the web UIs: load the model, analyze
    ``i_args.beatmap_path``, and return structured suggestion records
    (category / message / surprisal / timestamp / osu://edit link)."""
    from inference import compile_args, get_config, load_model

    i_args = select_config_for_gamemode(i_args)
    engine, vocab = load_model(i_args)
    compile_args(i_args, vocab)
    generation_config, _ = get_config(i_args)
    return ai_mod(
        i_args,
        generation_config=generation_config,
        engine=engine,
        vocab=vocab,
        beatmap_path=i_args.beatmap_path,
        raw_output=True,
        surprisal_threshold=surprisal_threshold,
        structured=True,
    )


def main(argv=None) -> None:
    from inference import compile_args, get_config, load_model

    argv = sys.argv[1:] if argv is None else argv
    config_name = "mai_mod"
    overrides = []
    i = 0
    while i < len(argv):
        if argv[i] in ("-cn", "--config-name"):
            config_name = argv[i + 1]
            i += 2
        else:
            overrides.append(argv[i])
            i += 1

    args = compose(REPO_ROOT / "configs", config_name, overrides=overrides, schema_cls=schema.MaiModConfig)
    i_args = args.inference
    i_args.beatmap_path = args.beatmap_path
    i_args.audio_path = args.audio_path
    i_args.precision = args.precision

    # gamemode-unsupported configs fall back to v31 with the user's explicit
    # inference overrides re-applied (reference: mai_mod.py:337-360)
    fallback_args = select_config_for_gamemode(i_args, overrides=overrides)
    if fallback_args is not i_args:
        i_args = args.inference = fallback_args

    engine, vocab = load_model(i_args)
    compile_args(i_args, vocab)
    generation_config, _ = get_config(i_args)

    return ai_mod(
        args,
        generation_config=generation_config,
        engine=engine,
        vocab=vocab,
        beatmap_path=args.beatmap_path,
        raw_output=args.raw_output,
    )


if __name__ == "__main__":
    main()

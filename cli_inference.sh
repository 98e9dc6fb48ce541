#!/bin/bash
# Interactive CLI for beatmap generation — prompts for the common options and
# runs `python inference.py` with the corresponding overrides.
# (reference: cli_inference.sh — same workflow, own implementation)
set -e

BOLD=$'\033[1m'; CYAN=$'\033[0;36m'; GREEN=$'\033[0;32m'; NC=$'\033[0m'
cd "$(dirname "$0")"

header() { echo; echo "${CYAN}== $1 ==${NC}"; }

ask() { # ask "prompt" default varname
    local input
    if [ -n "$2" ]; then
        read -e -p "${GREEN}$1${NC} [$2]: " input
        printf -v "$3" '%s' "${input:-$2}"
    else
        read -e -p "${GREEN}$1${NC}: " input
        printf -v "$3" '%s' "$input"
    fi
}

echo "${BOLD}Mapperatorinator (tpu) — interactive inference${NC}"

header "Model"
ask "Config name (v28/v29/v30/v31/v32)" "v32" CONFIG
ask "Model path (checkpoint dir)" "" MODEL_PATH
[ -z "$MODEL_PATH" ] && { echo "model path is required"; exit 1; }

header "Input"
ask "Audio path (.wav/.mp3/.ogg)" "" AUDIO_PATH
ask "Reference beatmap path (.osu, optional)" "" BEATMAP_PATH
ask "Output directory" "./output" OUTPUT_PATH

header "Generation"
ask "Gamemode (0=std 1=taiko 2=catch 3=mania, empty=auto)" "" GAMEMODE
ask "Difficulty (star rating, empty=auto)" "" DIFFICULTY
ask "Mapper user id (optional)" "" MAPPER_ID
ask "Year (optional)" "" YEAR
ask "Descriptors (comma-separated, optional)" "" DESCRIPTORS
ask "Seed (empty=random)" "" SEED
ask "CFG scale" "1.0" CFG_SCALE
ask "Temperature" "0.9" TEMPERATURE
ask "Super timing (more accurate, slower) [y/N]" "n" SUPER_TIMING
ask "Export .osz [y/N]" "n" EXPORT_OSZ
ask "Extra overrides (space-separated key=value, optional)" "" EXTRA

ARGS=(-cn "$CONFIG" "model_path=$MODEL_PATH" "output_path=$OUTPUT_PATH")
[ -n "$AUDIO_PATH" ]   && ARGS+=("audio_path=$AUDIO_PATH")
[ -n "$BEATMAP_PATH" ] && ARGS+=("beatmap_path=$BEATMAP_PATH")
[ -n "$GAMEMODE" ]     && ARGS+=("gamemode=$GAMEMODE")
[ -n "$DIFFICULTY" ]   && ARGS+=("difficulty=$DIFFICULTY")
[ -n "$MAPPER_ID" ]    && ARGS+=("mapper_id=$MAPPER_ID")
[ -n "$YEAR" ]         && ARGS+=("year=$YEAR")
[ -n "$DESCRIPTORS" ]  && ARGS+=("descriptors=[$DESCRIPTORS]")
[ -n "$SEED" ]         && ARGS+=("seed=$SEED")
ARGS+=("cfg_scale=$CFG_SCALE" "temperature=$TEMPERATURE")
[ "$SUPER_TIMING" = "y" ] && ARGS+=("super_timing=true")
[ "$EXPORT_OSZ" = "y" ]   && ARGS+=("export_osz=true")
# shellcheck disable=SC2206
[ -n "$EXTRA" ] && ARGS+=($EXTRA)

header "Running"
echo "python inference.py ${ARGS[*]}"
echo
exec python inference.py "${ARGS[@]}"

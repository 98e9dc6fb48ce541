// Native star-rating calculator (replaces the reference's rosu-pp dependency,
// reference: osuT5/osuT5/dataset/data_utils.py:195-226, calc_fid.py:149-163).
//
// Implements the classic (2014-2019 live) osu! strain-based difficulty
// algorithms for all four gamemodes. These are the long-published "ppv2"
// formulas: per-object strain with exponential decay, 400 ms section peaks,
// and a 0.9-weighted peak sum. They track current lazer ratings closely on
// typical maps but are not bit-identical to present-day rosu-pp.
//
// Exposed as a C ABI for ctypes; geometry (slider curves, stacking) is
// resolved on the Python side, which passes flat arrays.
//
// Build: make -C native   (g++ -O2 -shared -fPIC)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

namespace {

constexpr double kSectionLength = 400.0;  // ms per strain section
constexpr double kDecayWeight = 0.9;      // weight ratio of sorted peaks

// Weighted sum of sorted section peaks.
double weighted_peaks(std::vector<double>& peaks) {
    std::sort(peaks.begin(), peaks.end(), std::greater<double>());
    double difficulty = 0.0, weight = 1.0;
    for (double p : peaks) {
        difficulty += p * weight;
        weight *= kDecayWeight;
    }
    return difficulty;
}

// Generic strain-peak accumulator: times in ms (already clock-rate scaled),
// strains[i] is the running strain value at object i.
double peak_difficulty(const std::vector<double>& times, const std::vector<double>& strains,
                       double decay_base, double section_length = kSectionLength) {
    if (times.empty()) return 0.0;
    std::vector<double> peaks;
    double section_end = std::ceil(times[0] / section_length) * section_length;
    double current_peak = 0.0;
    for (size_t i = 0; i < times.size(); ++i) {
        while (times[i] > section_end) {
            peaks.push_back(current_peak);
            // carry the previous object's strain, decayed to the section start
            double gap = section_end - times[i ? i - 1 : 0];
            current_peak = i == 0 ? 0.0 : strains[i - 1] * std::pow(decay_base, gap / 1000.0);
            section_end += section_length;
        }
        current_peak = std::max(current_peak, strains[i]);
    }
    peaks.push_back(current_peak);
    return weighted_peaks(peaks);
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// osu!standard — aim + speed skills.
//   types: 0=circle, 1=slider, 2=spinner (spinners sit at playfield centre)
// ---------------------------------------------------------------------------
double osu_std_stars(const double* times, const double* xs, const double* ys,
                     const int32_t* types, int32_t n, double cs, double clock_rate) {
    if (n < 2) return 0.0;
    (void)types;

    // circle radius in osu!pixels and distance normalization
    double radius = 32.0 * (1.0 - 0.7 * (cs - 5.0) / 5.0);
    double scaling = 52.0 / radius;
    if (radius < 30.0) scaling *= 1.0 + std::min(30.0 - radius, 5.0) / 50.0;

    constexpr double kDecayBase[2] = {0.3, 0.15};      // speed, aim
    constexpr double kWeightScaling[2] = {1400.0, 26.25};
    constexpr double kAlmostDiameter = 90.0;
    constexpr double kStreamSpacing = 110.0;
    constexpr double kSingleSpacing = 125.0;

    std::vector<double> t(n);
    for (int32_t i = 0; i < n; ++i) t[i] = times[i] / clock_rate;

    double stars[2];
    for (int skill = 0; skill < 2; ++skill) {
        std::vector<double> strains(n, 1.0);
        double strain = 1.0;
        for (int32_t i = 1; i < n; ++i) {
            double dt = t[i] - t[i - 1];
            double decay = std::pow(kDecayBase[skill], dt / 1000.0);
            double dx = (xs[i] - xs[i - 1]) * scaling;
            double dy = (ys[i] - ys[i - 1]) * scaling;
            double d = std::sqrt(dx * dx + dy * dy);

            double addition;
            if (skill == 0) {  // speed: spacing weight
                if (d > kSingleSpacing) {
                    addition = 2.5;
                } else if (d > kStreamSpacing) {
                    addition = 1.6 + 0.9 * (d - kStreamSpacing) / (kSingleSpacing - kStreamSpacing);
                } else if (d > kAlmostDiameter) {
                    addition = 1.2 + 0.4 * (d - kAlmostDiameter) / (kStreamSpacing - kAlmostDiameter);
                } else if (d > kAlmostDiameter / 2.0) {
                    addition = 0.95 + 0.25 * (d - kAlmostDiameter / 2.0) / (kAlmostDiameter / 2.0);
                } else {
                    addition = 0.95;
                }
            } else {  // aim
                addition = std::pow(d, 0.99);
            }
            strain = strain * decay + addition * kWeightScaling[skill] / std::max(dt, 50.0);
            strains[i] = strain;
        }
        stars[skill] = std::sqrt(peak_difficulty(t, strains, kDecayBase[skill])) * 0.0675;
    }
    return stars[0] + stars[1] + std::abs(stars[0] - stars[1]) * 0.5;
}

// ---------------------------------------------------------------------------
// taiko — colour-change + rhythm-change strain.
//   colors: 0=don (red), 1=kat (blue), other values = drumroll/denden (no
//   colour contribution)
// ---------------------------------------------------------------------------
double taiko_stars(const double* times, const int32_t* colors, int32_t n, double clock_rate) {
    if (n < 2) return 0.0;
    constexpr double kDecayBase = 0.30;
    constexpr double kRhythmChangeBase = 2.0;
    constexpr double kRhythmChangeBaseThreshold = 0.2;

    std::vector<double> t(n);
    for (int32_t i = 0; i < n; ++i) t[i] = times[i] / clock_rate;

    std::vector<double> strains(n, 1.0);
    double strain = 1.0;
    double prev_dt = -1.0;
    int same_color_count = 1;
    for (int32_t i = 1; i < n; ++i) {
        double dt = t[i] - t[i - 1];
        double decay = std::pow(kDecayBase, dt / 1000.0);

        double addition = 1.0;
        bool is_hit = colors[i] <= 1 && colors[i - 1] <= 1;
        if (is_hit && dt < 1000.0) {
            // colour change: counts runs of a colour; parity-gated bonus
            if (colors[i] != colors[i - 1]) {
                addition += (same_color_count % 2 == 0) ? 0.75 : 0.0;
                same_color_count = 1;
            } else {
                ++same_color_count;
            }
            // rhythm change: gap ratio moved by more than the threshold
            if (prev_dt > 0.0 && dt > 0.0) {
                double ratio = dt > prev_dt ? dt / prev_dt : prev_dt / dt;
                if (std::abs(ratio - std::round(ratio)) > kRhythmChangeBaseThreshold &&
                    ratio < kRhythmChangeBase * 8.0) {
                    addition += 1.0;
                }
            }
        }
        double addition_factor = dt < 50.0 ? 0.4 + 0.6 * dt / 50.0 : 1.0;
        strain = strain * decay + addition * addition_factor;
        strains[i] = strain;
        prev_dt = dt;
    }
    return std::sqrt(peak_difficulty(t, strains, kDecayBase)) * 0.04125;
}

// ---------------------------------------------------------------------------
// mania — per-column individual strain + overall strain with hold-note
// overlap bonuses.
// ---------------------------------------------------------------------------
double mania_stars(const double* times, const double* end_times, const int32_t* columns,
                   int32_t n, int32_t keys, double clock_rate) {
    if (n < 2 || keys < 1) return 0.0;
    constexpr double kIndividualDecayBase = 0.125;
    constexpr double kOverallDecayBase = 0.30;

    std::vector<double> t(n), et(n);
    for (int32_t i = 0; i < n; ++i) {
        t[i] = times[i] / clock_rate;
        et[i] = std::max(end_times[i], times[i]) / clock_rate;
    }

    std::vector<double> individual(keys, 0.0);
    std::vector<double> held_until(keys, 0.0);
    std::vector<double> strains(n, 1.0);
    double overall = 1.0;
    for (int32_t i = 1; i < n; ++i) {
        double dt = t[i] - t[i - 1];
        int32_t col = std::clamp(columns[i], 0, keys - 1);

        double hold_factor = 1.0, hold_addition = 0.0;
        for (int32_t k = 0; k < keys; ++k) {
            if (held_until[k] > et[i] + 1.0) hold_factor = 1.25;       // spans past this note
            else if (held_until[k] > t[i] + 1.0) hold_addition = 1.0;  // releases during it
        }

        for (int32_t k = 0; k < keys; ++k)
            individual[k] *= std::pow(kIndividualDecayBase, dt / 1000.0);
        overall = overall * std::pow(kOverallDecayBase, dt / 1000.0) + (1.0 + hold_addition) * hold_factor;
        individual[col] += 2.0 * hold_factor;

        held_until[col] = et[i];
        strains[i] = individual[col] + overall;
    }
    return peak_difficulty(t, strains, kOverallDecayBase) * 0.018;
}

// ---------------------------------------------------------------------------
// catch — horizontal movement strain with direction-change bonus.
// ---------------------------------------------------------------------------
double catch_stars(const double* times, const double* xs, int32_t n, double cs, double clock_rate) {
    if (n < 2) return 0.0;
    constexpr double kDecayBase = 0.20;
    constexpr double kStrainStep = 750.0;
    constexpr double kPeaksDecayWeight = 0.94;
    constexpr double kPositionError = 16.0;           // absolute player positioning error
    constexpr double kNormalizedRadius = 41.0;
    constexpr double kDirectionChangeBonus = 12.5;

    double catcher_width = 305.0 * (1.0 - 0.7 * (cs - 5.0) / 5.0) / 2.0;
    double scaling = kNormalizedRadius / (catcher_width * 0.4);

    std::vector<double> t(n);
    for (int32_t i = 0; i < n; ++i) t[i] = times[i] / clock_rate;

    std::vector<double> strains(n, 1.0);
    double strain = 1.0;
    double last_dir = 0.0;
    double player_x = xs[0] * scaling;
    for (int32_t i = 1; i < n; ++i) {
        double dt = std::max(t[i] - t[i - 1], 25.0);
        double decay = std::pow(kDecayBase, dt / 1000.0);

        double target = xs[i] * scaling;
        double dist = std::abs(target - player_x);
        double dir = target > player_x ? 1.0 : (target < player_x ? -1.0 : 0.0);

        double addition = std::pow(std::max(dist - kPositionError * scaling, 0.0), 1.3) / 500.0;
        if (dir != 0.0 && dir != last_dir && last_dir != 0.0) {
            addition += kDirectionChangeBonus / std::max(dt, 25.0) * std::min(dist / 100.0, 1.0);
        }
        strain = strain * decay + addition * 850.0 / std::max(dt, 25.0);
        strains[i] = strain;
        player_x = target;
        if (dir != 0.0) last_dir = dir;
    }

    // catch uses 750 ms sections and 0.94 peak weighting
    std::vector<double> peaks;
    double section_end = std::ceil(t[0] / kStrainStep) * kStrainStep;
    double current_peak = 0.0;
    for (int32_t i = 0; i < n; ++i) {
        while (t[i] > section_end) {
            peaks.push_back(current_peak);
            double gap = section_end - t[i ? i - 1 : 0];
            current_peak = i == 0 ? 0.0 : strains[i - 1] * std::pow(kDecayBase, gap / 1000.0);
            section_end += kStrainStep;
        }
        current_peak = std::max(current_peak, strains[i]);
    }
    peaks.push_back(current_peak);
    std::sort(peaks.begin(), peaks.end(), std::greater<double>());
    double difficulty = 0.0, weight = 1.0;
    for (double p : peaks) {
        difficulty += p * weight;
        weight *= kPeaksDecayWeight;
    }
    return std::sqrt(difficulty) * 0.145;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// osu!standard — CURRENT (lazer 2022+/rosu-pp 3.x) algorithm.
//
// Ports the modern evaluator structure: DifficultyHitObject preprocessing
// (lazy jump / minimum jump / angles, slider travel), the Aim evaluator
// (wide/acute angle bonuses, velocity-change and slider bonuses, with and
// without sliders), the Speed evaluator with the island-based Rhythm
// multiplier, OsuStrainSkill peak reduction, and the 2-skill star-rating
// combination. The Python wrapper resolves slider geometry (lazy travel via
// the follow-circle cursor simulation) and stacking, and passes flat arrays.
//
// Not bit-verified against rosu-pp (no network in this environment; see
// tests/test_difficulty.py for the structural/monotonicity suite) but
// implements the same published algorithm rather than 2014 ppv2.
// ---------------------------------------------------------------------------

namespace modern {

constexpr double kPi = 3.14159265358979323846;
constexpr double kNormalisedRadius = 50.0;
constexpr double kMaximumSliderRadius = kNormalisedRadius * 2.4;
constexpr double kAssumedSliderRadius = kNormalisedRadius * 1.8;
constexpr double kMinDeltaTime = 25.0;

struct HitObject {
    double time;          // clock-adjusted ms
    double x, y;          // stacked position
    int type;             // 0 circle, 1 slider, 2 spinner
    // slider-only fields (normalized units / adjusted ms)
    double lazy_end_x, lazy_end_y;
    double travel_dist;       // normalized lazy travel distance
    double travel_time;       // adjusted ms (>= kMinDeltaTime)
    double tail_x, tail_y;    // stacked tail position
};

struct DiffObject {
    double strain_time = 0.0;       // delta clamped to >= 25ms
    double delta_time = 0.0;
    double lazy_jump = 0.0;         // normalized
    double min_jump = 0.0;          // normalized
    double min_jump_time = 0.0;
    double travel_dist = 0.0;       // of THIS object when it is a slider
    double travel_time = kMinDeltaTime;
    double angle = -1.0;            // <0 == undefined
    bool is_slider = false;
    bool is_spinner = false;
};

inline double length(double dx, double dy) { return std::sqrt(dx * dx + dy * dy); }

// cursor position the player is assumed to leave an object at
inline void end_cursor(const HitObject& h, double* cx, double* cy) {
    if (h.type == 1) { *cx = h.lazy_end_x; *cy = h.lazy_end_y; }
    else { *cx = h.x; *cy = h.y; }
}

std::vector<DiffObject> preprocess(const std::vector<HitObject>& objs, double scaling) {
    std::vector<DiffObject> out(objs.size());
    for (size_t i = 1; i < objs.size(); ++i) {
        const HitObject& curr = objs[i];
        const HitObject& last = objs[i - 1];
        DiffObject& d = out[i];
        d.delta_time = curr.time - last.time;
        d.strain_time = std::max(d.delta_time, kMinDeltaTime);
        d.is_slider = curr.type == 1;
        d.is_spinner = curr.type == 2;
        d.travel_dist = curr.type == 1 ? curr.travel_dist : 0.0;
        d.travel_time = curr.type == 1 ? std::max(curr.travel_time, kMinDeltaTime) : kMinDeltaTime;

        if (curr.type == 2 || last.type == 2) continue;  // spinners carry no distances

        double lcx, lcy;
        end_cursor(last, &lcx, &lcy);
        d.lazy_jump = length(curr.x - lcx, curr.y - lcy) * scaling;
        d.min_jump = d.lazy_jump;
        d.min_jump_time = d.strain_time;

        if (last.type == 1) {
            double last_travel = std::max(last.travel_time, kMinDeltaTime);
            d.min_jump_time = std::max(d.strain_time - last_travel, kMinDeltaTime);
            double tail_jump = length(last.tail_x - curr.x, last.tail_y - curr.y) * scaling;
            d.min_jump = std::max(
                0.0, std::min(d.lazy_jump - (kMaximumSliderRadius - kAssumedSliderRadius),
                              tail_jump - kMaximumSliderRadius));
        }

        if (i >= 2) {
            const HitObject& last_last = objs[i - 2];
            if (last_last.type != 2) {
                double llcx, llcy;
                end_cursor(last_last, &llcx, &llcy);
                double v1x = llcx - last.x, v1y = llcy - last.y;
                double v2x = curr.x - lcx, v2y = curr.y - lcy;
                double dot = v1x * v2x + v1y * v2y;
                double det = v1x * v2y - v1y * v2x;
                if (length(v1x, v1y) > 1e-9 && length(v2x, v2y) > 1e-9)
                    d.angle = std::abs(std::atan2(det, dot));
            }
        }
    }
    return out;
}

inline double calc_wide_angle_bonus(double angle) {
    double a = std::min(5.0 / 6.0 * kPi, std::max(kPi / 6.0, angle));
    double s = std::sin(3.0 / 4.0 * (a - kPi / 6.0));
    return s * s;
}

inline double calc_acute_angle_bonus(double angle) { return 1.0 - calc_wide_angle_bonus(angle); }

// AimEvaluator (osu.Game.Rulesets.Osu.Difficulty.Evaluators.AimEvaluator)
double aim_value(const std::vector<DiffObject>& d, size_t i, bool with_sliders) {
    constexpr double wide_angle_multiplier = 1.5;
    constexpr double acute_angle_multiplier = 1.95;
    constexpr double slider_multiplier = 1.35;
    constexpr double velocity_change_multiplier = 0.75;

    if (i < 2) return 0.0;
    const DiffObject& curr = d[i];
    const DiffObject& last = d[i - 1];
    if (curr.is_spinner || last.is_spinner) return 0.0;

    double curr_velocity = curr.lazy_jump / curr.strain_time;
    if (last.is_slider && with_sliders) {
        double travel_velocity = last.travel_dist / last.travel_time;
        double movement_velocity = curr.min_jump / curr.min_jump_time;
        curr_velocity = std::max(curr_velocity, movement_velocity + travel_velocity);
    }

    double prev_velocity = last.lazy_jump / last.strain_time;
    if (i >= 2 && d[i - 2].is_slider && with_sliders) {
        double travel_velocity = d[i - 2].travel_dist / d[i - 2].travel_time;
        double movement_velocity = last.min_jump / last.min_jump_time;
        prev_velocity = std::max(prev_velocity, movement_velocity + travel_velocity);
    }

    double wide_angle_bonus = 0.0, acute_angle_bonus = 0.0;
    double slider_bonus = 0.0, velocity_change_bonus = 0.0;
    double aim_strain = curr_velocity;

    if (std::max(curr.strain_time, last.strain_time) <
        1.25 * std::min(curr.strain_time, last.strain_time)) {
        if (curr.angle >= 0.0 && last.angle >= 0.0 && i >= 2 && d[i - 2].angle >= 0.0) {
            double angle_bonus = std::min(curr_velocity, prev_velocity);
            wide_angle_bonus = calc_wide_angle_bonus(curr.angle);
            acute_angle_bonus = calc_acute_angle_bonus(curr.angle);
            if (curr.strain_time > 100.0) {
                acute_angle_bonus = 0.0;
            } else {
                double s1 = std::sin(kPi / 2.0 * std::min(1.0, (100.0 - curr.strain_time) / 25.0));
                double jump = std::clamp(curr.lazy_jump, 50.0, 100.0);
                double s2 = std::sin(kPi / 2.0 * (jump - 50.0) / 50.0);
                acute_angle_bonus *= calc_acute_angle_bonus(last.angle) *
                                     std::min(angle_bonus, 125.0 / curr.strain_time) *
                                     s1 * s1 * s2 * s2;
            }
            double last_wide = calc_wide_angle_bonus(last.angle);
            wide_angle_bonus *= angle_bonus *
                (1.0 - std::min(wide_angle_bonus, last_wide * last_wide * last_wide));
            double ll_acute = calc_acute_angle_bonus(d[i - 2].angle);
            acute_angle_bonus *= 0.5 + 0.5 *
                (1.0 - std::min(acute_angle_bonus, ll_acute * ll_acute * ll_acute));
        }
    }

    if (std::max(prev_velocity, curr_velocity) > 0.0) {
        double pv = (last.lazy_jump + (i >= 2 ? d[i - 2].travel_dist : 0.0)) / last.strain_time;
        double cv = (curr.lazy_jump + last.travel_dist) / curr.strain_time;
        double s = std::sin(kPi / 2.0 * std::abs(pv - cv) / std::max(pv, std::max(cv, 1e-9)));
        double dist_ratio = s * s;
        double overlap_velocity_buff =
            std::min(125.0 / std::min(curr.strain_time, last.strain_time), std::abs(pv - cv));
        double t_ratio = std::min(curr.strain_time, last.strain_time) /
                         std::max(curr.strain_time, last.strain_time);
        velocity_change_bonus = overlap_velocity_buff * dist_ratio * t_ratio * t_ratio;
    }

    if (last.is_slider) slider_bonus = last.travel_dist / last.travel_time;

    aim_strain += std::max(acute_angle_bonus * acute_angle_multiplier,
                           wide_angle_bonus * wide_angle_multiplier +
                               velocity_change_bonus * velocity_change_multiplier);
    if (with_sliders) aim_strain += slider_bonus * slider_multiplier;
    return aim_strain;
}

// RhythmEvaluator: island-based rhythm complexity over a 5 s history
double rhythm_value(const std::vector<DiffObject>& d, size_t i, double great_window) {
    constexpr double history_time_max = 5000.0;
    constexpr double rhythm_multiplier = 0.75;

    if (d[i].is_spinner) return 1.0;

    double rhythm_complexity_sum = 0.0;
    int island_size = 1, previous_island_size = 0;
    double start_ratio = 0.0;
    bool first_delta_switch = false;

    int historical_note_count = std::min<int>(static_cast<int>(i), 32);
    int rhythm_start = 0;
    // accumulate object start times backwards
    std::vector<double> rel_start(historical_note_count + 2, 0.0);
    for (int b = 1; b <= historical_note_count + 1 && static_cast<int>(i) - b >= 0; ++b)
        rel_start[b] = rel_start[b - 1] + d[i - b + 1].delta_time;

    while (rhythm_start < historical_note_count - 2 &&
           rel_start[rhythm_start + 1] < history_time_max)
        ++rhythm_start;

    for (int j = rhythm_start; j > 0; --j) {
        const DiffObject& curr_obj = d[i - j + 1];
        const DiffObject& prev_obj = d[i - j];
        const DiffObject& last_obj = (static_cast<int>(i) - j - 1) >= 0 ? d[i - j - 1] : d[i - j];

        double curr_historical_decay =
            (history_time_max - rel_start[j - 1 >= 0 ? j - 1 : 0]) / history_time_max;
        if (curr_historical_decay <= 0.0) continue;
        curr_historical_decay = std::min(
            static_cast<double>(historical_note_count - j) / historical_note_count,
            curr_historical_decay);

        double curr_delta = curr_obj.strain_time;
        double prev_delta = prev_obj.strain_time;
        double last_delta = last_obj.strain_time;
        double ratio_arg = kPi / (std::min(prev_delta, curr_delta) / std::max(prev_delta, curr_delta));
        double s = std::sin(ratio_arg);
        double curr_ratio = 1.0 + 6.0 * std::min(0.5, s * s);

        double window_penalty = std::min(
            1.0, std::max(0.0, std::abs(prev_delta - curr_delta) - great_window * 0.3) /
                     (great_window * 0.3));
        double effective_ratio = window_penalty * curr_ratio;

        if (first_delta_switch) {
            if (!(prev_delta > 1.25 * curr_delta || prev_delta * 1.25 < curr_delta)) {
                if (island_size < 7) ++island_size;
            } else {
                if (curr_obj.is_slider) effective_ratio *= 0.125;
                if (prev_obj.is_slider) effective_ratio *= 0.25;
                if (previous_island_size == island_size) effective_ratio *= 0.25;
                if (previous_island_size % 2 == island_size % 2) effective_ratio *= 0.50;
                if (last_delta > prev_delta + 10.0 && prev_delta > curr_delta + 10.0)
                    effective_ratio *= 0.125;

                rhythm_complexity_sum += std::sqrt(effective_ratio * start_ratio) *
                                         curr_historical_decay *
                                         std::sqrt(4.0 + island_size) / 2.0 *
                                         std::sqrt(4.0 + previous_island_size) / 2.0;
                start_ratio = effective_ratio;
                previous_island_size = island_size;
                if (prev_delta * 1.25 < curr_delta) first_delta_switch = false;
                island_size = 1;
            }
        } else if (prev_delta > 1.25 * curr_delta) {
            first_delta_switch = true;
            start_ratio = effective_ratio;
            island_size = 1;
        }
    }
    return std::sqrt(4.0 + rhythm_complexity_sum * rhythm_multiplier) / 2.0;
}

// SpeedEvaluator
double speed_value(const std::vector<DiffObject>& d, size_t i, double great_window) {
    constexpr double single_spacing_threshold = 125.0;
    constexpr double min_speed_bonus = 75.0;
    constexpr double speed_balancing_factor = 40.0;

    if (d[i].is_spinner) return 0.0;

    double strain_time = d[i].strain_time;

    // doubletapness against the NEXT object (lazer GetDoubletapness)
    double doubletapness = 1.0;
    if (i + 1 < d.size() && !d[i + 1].is_spinner) {
        double curr_delta = std::max(1.0, d[i].delta_time);
        double next_delta = std::max(1.0, d[i + 1].delta_time);
        double delta_diff = std::abs(next_delta - curr_delta);
        double speed_ratio = curr_delta / std::max(curr_delta, delta_diff);
        double window_ratio = std::pow(std::min(1.0, curr_delta / great_window), 2.0);
        doubletapness = std::pow(speed_ratio, 1.0 - window_ratio);
    }

    double speed_bonus = 1.0;
    if (strain_time < min_speed_bonus) {
        double r = (min_speed_bonus - strain_time) / speed_balancing_factor;
        speed_bonus = 1.0 + 0.75 * r * r;
    }

    double travel = i >= 1 ? d[i - 1].travel_dist : 0.0;
    double dist = std::min(single_spacing_threshold, travel + d[i].min_jump);

    return (speed_bonus + speed_bonus * std::pow(dist / single_spacing_threshold, 3.5)) *
           doubletapness / strain_time;
}

// StrainSkill section peaks + OsuStrainSkill reduced-section difficulty value
double strain_skill_difficulty(const std::vector<double>& times,
                               const std::vector<double>& strains,
                               double decay_base, int reduced_section_count,
                               double difficulty_multiplier) {
    constexpr double section_length = 400.0;
    if (times.empty()) return 0.0;
    std::vector<double> peaks;
    double section_end = std::ceil(times[0] / section_length) * section_length;
    double current_peak = 0.0;
    for (size_t i = 0; i < times.size(); ++i) {
        while (times[i] > section_end) {
            if (current_peak > 0.0) peaks.push_back(current_peak);
            double gap = section_end - times[i ? i - 1 : 0];
            current_peak = i == 0 ? 0.0 : strains[i - 1] * std::pow(decay_base, gap / 1000.0);
            section_end += section_length;
        }
        current_peak = std::max(current_peak, strains[i]);
    }
    if (current_peak > 0.0) peaks.push_back(current_peak);

    std::sort(peaks.begin(), peaks.end(), std::greater<double>());
    int n_reduce = std::min<int>(peaks.size(), reduced_section_count);
    for (int i = 0; i < n_reduce; ++i) {
        double t = std::clamp(static_cast<double>(i) / reduced_section_count, 0.0, 1.0);
        double scale = std::log10(1.0 + t * 9.0);  // lerp(1, 10, t) in log10
        peaks[i] *= 0.75 + (1.0 - 0.75) * scale;   // lerp(ReducedStrainBaseline, 1, scale)
    }
    std::sort(peaks.begin(), peaks.end(), std::greater<double>());

    double difficulty = 0.0, weight = 1.0;
    for (double p : peaks) {
        difficulty += p * weight;
        weight *= 0.9;
    }
    return difficulty * difficulty_multiplier;
}

}  // namespace modern

extern "C" {

// Current-algorithm osu!std star rating.
//   times: raw ms (NOT clock-scaled; scaling happens here)
//   xs/ys: stacked positions; types: 0 circle / 1 slider / 2 spinner
//   lazy_end_x/y, travel_dist (normalized), travel_time (raw ms),
//   tail_x/y: slider fields (ignored for non-sliders)
//   radius: object radius in osu!px; od: overall difficulty; clock_rate
double osu_std_stars_v2(const double* times, const double* xs, const double* ys,
                        const int32_t* types,
                        const double* lazy_end_x, const double* lazy_end_y,
                        const double* travel_dist, const double* travel_time,
                        const double* tail_x, const double* tail_y,
                        int32_t n, double radius, double od, double clock_rate) {
    using namespace modern;
    if (n < 2) return 0.0;

    double scaling = kNormalisedRadius / radius;
    if (radius < 30.0) scaling *= 1.0 + std::min(30.0 - radius, 5.0) / 50.0;

    std::vector<HitObject> objs(n);
    for (int32_t i = 0; i < n; ++i) {
        objs[i] = {times[i] / clock_rate, xs[i], ys[i], types[i],
                   lazy_end_x[i], lazy_end_y[i],
                   travel_dist[i], travel_time[i] / clock_rate,
                   tail_x[i], tail_y[i]};
    }
    std::vector<DiffObject> d = preprocess(objs, scaling);

    double great_window = (80.0 - 6.0 * od) / clock_rate;
    std::vector<double> t(n);
    for (int32_t i = 0; i < n; ++i) t[i] = objs[i].time;

    // skills: aim (with sliders) + speed (with the rhythm multiplier).
    // (The no-sliders aim pass only feeds lazer's SliderFactor pp attribute,
    // which the star rating does not use — deliberately not computed.)
    constexpr double aim_skill_multiplier = 23.55;
    constexpr double aim_decay = 0.15;
    constexpr double speed_skill_multiplier = 1375.0;
    constexpr double speed_decay = 0.3;

    std::vector<double> aim_strains(n, 0.0), speed_strains(n, 0.0);
    double aim_strain = 0.0, speed_strain = 0.0;
    for (int32_t i = 1; i < n; ++i) {
        double dt = d[i].delta_time;
        aim_strain = aim_strain * std::pow(aim_decay, dt / 1000.0) +
                     aim_value(d, i, true) * aim_skill_multiplier;
        double rhythm = rhythm_value(d, i, great_window);
        speed_strain = speed_strain * std::pow(speed_decay, dt / 1000.0) +
                       speed_value(d, i, great_window) * speed_skill_multiplier;
        aim_strains[i] = aim_strain;
        speed_strains[i] = speed_strain * rhythm;
    }

    double aim_difficulty = strain_skill_difficulty(t, aim_strains, aim_decay, 10, 1.06);
    double speed_difficulty = strain_skill_difficulty(t, speed_strains, speed_decay, 5, 1.04);

    double aim_rating = std::sqrt(aim_difficulty) * 0.0675;
    double speed_rating = std::sqrt(speed_difficulty) * 0.0675;

    double base_aim = std::pow(5.0 * std::max(1.0, aim_rating / 0.0675) - 4.0, 3.0) / 100000.0;
    double base_speed = std::pow(5.0 * std::max(1.0, speed_rating / 0.0675) - 4.0, 3.0) / 100000.0;
    double base_perf = std::pow(std::pow(base_aim, 1.1) + std::pow(base_speed, 1.1), 1.0 / 1.1);

    if (base_perf <= 0.00001) return 0.0;
    constexpr double performance_base_multiplier = 1.15;
    return std::cbrt(performance_base_multiplier) * 0.027 *
           (std::cbrt(100000.0 / std::pow(2.0, 1.0 / 1.1) * base_perf) + 4.0);
}

}  // extern "C"

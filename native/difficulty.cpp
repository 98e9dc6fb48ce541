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

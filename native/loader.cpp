// Native sensor-log loader/batcher for the IC-GVINS-TPU replay engine.
//
// Replaces the reference's ROS ingest path (ROS/fusion_ros.cc:123-234):
// parses IMU/GNSS text logs, converts rate-form samples to increment form,
// gap-fills lost IMU samples at the nominal rate (fusion_ros.cc /
// ic_gvins.cc:171-183), and converts GNSS degrees->radians — producing
// packed column arrays the Python engine maps zero-copy via ctypes.
//
// Build: make (g++ -O3 -march=native -shared -fPIC).

#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

constexpr double kPi = 3.14159265358979323846;

struct Buffer {
    double* data;
    long rows;
    long cols;
};

// Fast whitespace-separated double parser over a whole file.
bool parse_table(const char* path, std::vector<double>& values, long& rows, long& cols) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return false;
    std::fseek(f, 0, SEEK_END);
    long size = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    std::vector<char> text(size + 1);
    if (std::fread(text.data(), 1, size, f) != static_cast<size_t>(size)) {
        std::fclose(f);
        return false;
    }
    std::fclose(f);
    text[size] = '\0';

    rows = 0;
    cols = -1;
    char* p = text.data();
    char* end = text.data() + size;
    long line_cols = 0;

    auto end_line = [&]() -> bool {
        if (line_cols > 0) {
            if (cols < 0) cols = line_cols;
            if (line_cols != cols) return false;  // ragged
            ++rows;
        }
        line_cols = 0;
        return true;
    };

    while (p < end) {
        char c = *p;
        if (c == '\n') {
            if (!end_line()) return false;
            ++p;
            continue;
        }
        if (c == ' ' || c == '\t' || c == '\r' || c == ',') {
            ++p;
            continue;
        }
        if (c == '#' || c == '%') {
            while (p < end && *p != '\n') ++p;
            continue;
        }
        char* next = nullptr;
        double v = std::strtod(p, &next);
        if (next == p) {
            ++p;  // unparseable char
            continue;
        }
        // strtod skips leading whitespace incl. newlines — restrict: we
        // already positioned p at a token start, so next > p is this line's
        values.push_back(v);
        ++line_cols;
        p = next;
    }
    if (!end_line()) return false;
    return cols > 0;
}

}  // namespace

extern "C" {

// Load an IMU log. Columns: time, gyro xyz, accel xyz [, odovel].
// mode 0: samples are increments (dtheta, dvel) — KAIST/IC-GVINS convention;
// mode 1: samples are rates (rad/s, m/s^2) — converted via the sample dt.
// Gap-fills missing samples at the nominal dt (1/rate) by replicating the
// last increment, exactly like GVINS::addNewImu (ic_gvins.cc:171-183).
// Output: 7 columns [time, dt, dtheta xyz, dvel xyz] (+ odovel as col 8 when
// present -> cols = 8 or 9). Caller frees with loader_free().
int loader_load_imu(const char* path, double rate, int mode, double** out,
                    long* out_rows, long* out_cols) {
    std::vector<double> v;
    long rows, cols;
    if (!parse_table(path, v, rows, cols) || cols < 7) return -1;
    const bool has_odo = cols >= 8;
    const double nominal_dt = 1.0 / rate;

    std::vector<double> packed;
    packed.reserve(rows * 9);
    double prev_time = v[0] - nominal_dt;

    const long out_c = has_odo ? 9 : 8;
    for (long r = 0; r < rows; ++r) {
        const double* row = &v[r * cols];
        double t = row[0];
        double dt = t - prev_time;
        if (dt <= 0) continue;

        long fill = 0;
        if (dt > nominal_dt * 1.5) {
            fill = std::lround(dt / nominal_dt) - 1;
        }
        double scale_dt = (fill > 0) ? nominal_dt : dt;
        double dth[3], dvl[3];
        for (int k = 0; k < 3; ++k) {
            dth[k] = (mode == 1) ? row[1 + k] * scale_dt : row[1 + k];
            dvl[k] = (mode == 1) ? row[4 + k] * scale_dt : row[4 + k];
        }
        double odo = has_odo ? row[7] : 0.0;

        // synthesized fill samples leading up to t
        for (long g = 0; g < fill; ++g) {
            double tg = t - dt + nominal_dt * (g + 1);
            packed.push_back(tg);
            packed.push_back(nominal_dt);
            for (int k = 0; k < 3; ++k) packed.push_back(dth[k]);
            for (int k = 0; k < 3; ++k) packed.push_back(dvl[k]);
            if (has_odo) packed.push_back(odo);
        }
        packed.push_back(t);
        packed.push_back(fill > 0 ? nominal_dt : dt);
        for (int k = 0; k < 3; ++k) packed.push_back(dth[k]);
        for (int k = 0; k < 3; ++k) packed.push_back(dvl[k]);
        if (has_odo) packed.push_back(odo);
        prev_time = t;
    }

    long n = static_cast<long>(packed.size()) / out_c;
    double* buf = static_cast<double*>(std::malloc(packed.size() * sizeof(double)));
    if (!buf) return -2;
    std::memcpy(buf, packed.data(), packed.size() * sizeof(double));
    *out = buf;
    *out_rows = n;
    *out_cols = out_c;
    return 0;
}

// Load a GNSS log. Columns: time, lat(deg), lon(deg), h, std_n, std_e, std_d.
// Output columns: [time, lat(rad), lon(rad), h, std x3]. deg2rad applied
// (fusion_ros.cc:172-177).
int loader_load_gnss(const char* path, double** out, long* out_rows, long* out_cols) {
    std::vector<double> v;
    long rows, cols;
    if (!parse_table(path, v, rows, cols) || cols < 7) return -1;
    double* buf = static_cast<double*>(std::malloc(rows * 7 * sizeof(double)));
    if (!buf) return -2;
    for (long r = 0; r < rows; ++r) {
        const double* row = &v[r * cols];
        double* o = &buf[r * 7];
        o[0] = row[0];
        o[1] = row[1] * kPi / 180.0;
        o[2] = row[2] * kPi / 180.0;
        o[3] = row[3];
        o[4] = row[4];
        o[5] = row[5];
        o[6] = row[6];
    }
    *out = buf;
    *out_rows = rows;
    *out_cols = 7;
    return 0;
}

// Generic numeric table (e.g. frame-timestamp lists).
int loader_load_table(const char* path, double** out, long* out_rows, long* out_cols) {
    std::vector<double> v;
    long rows, cols;
    if (!parse_table(path, v, rows, cols)) return -1;
    double* buf = static_cast<double*>(std::malloc(v.size() * sizeof(double)));
    if (!buf) return -2;
    std::memcpy(buf, v.data(), v.size() * sizeof(double));
    *out = buf;
    *out_rows = rows;
    *out_cols = cols;
    return 0;
}

void loader_free(double* buf) { std::free(buf); }

}  // extern "C"

// Native runtime support library for acados_tpu.
//
// TPU-native counterpart of the reference's C runtime utilities:
//   - monotonic timers        (reference acados/utils/timing.h:43-86)
//   - flat iterate pack/unpack (reference ocp_nlp_get_all/set_all,
//     interfaces/acados_c/ocp_nlp_interface.c:1914-2018)
//   - binary iterate checkpoint files (reference stores JSON via Python,
//     acados_ocp_iterate.py; batched TPU iterates are MBs — binary I/O
//     keeps checkpoint/restore off the solve critical path)
//
// Exposed as a plain C ABI loaded via ctypes (no pybind11 in this
// environment). All data is f64 contiguous; Python owns array memory for
// pack/unpack, the library owns memory for loaded files (handle-based).
//
// File format ("ATNI" v1, little-endian):
//   magic  u32 = 0x494E5441 ("ATNI")
//   version u32 = 1
//   count  u32
//   per entry: name_len u32, name bytes, numel u64, f64 data[numel]

#include <chrono>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <map>
#include <mutex>
#include <string>
#include <vector>

namespace {

struct IterateFile {
    std::vector<std::string> names;
    std::vector<std::vector<double>> data;
};

std::mutex g_mutex;
std::map<int64_t, IterateFile> g_handles;
int64_t g_next_handle = 1;

constexpr uint32_t kMagic = 0x494E5441u;  // "ATNI"
constexpr uint32_t kVersion = 1;

}  // namespace

extern "C" {

// ---- timing (reference utils/timing.h analog) ----------------------------

double atn_time() {
    using clock = std::chrono::steady_clock;
    auto now = clock::now().time_since_epoch();
    return std::chrono::duration<double>(now).count();
}

// ---- flat iterate pack/unpack (ocp_nlp_get_all/set_all analog) -----------

// Concatenate nsrc f64 segments into out; returns total doubles written.
int64_t atn_pack(const double** srcs, const int64_t* sizes, int32_t nsrc,
                 double* out) {
    int64_t off = 0;
    for (int32_t i = 0; i < nsrc; ++i) {
        std::memcpy(out + off, srcs[i],
                    static_cast<size_t>(sizes[i]) * sizeof(double));
        off += sizes[i];
    }
    return off;
}

// Scatter a flat buffer back into nsrc segments; returns doubles read.
int64_t atn_unpack(const double* in, const int64_t* sizes, int32_t nsrc,
                   double** dsts) {
    int64_t off = 0;
    for (int32_t i = 0; i < nsrc; ++i) {
        std::memcpy(dsts[i], in + off,
                    static_cast<size_t>(sizes[i]) * sizeof(double));
        off += sizes[i];
    }
    return off;
}

// ---- binary iterate checkpoint I/O ---------------------------------------

// Returns 0 on success, negative errno-style codes on failure.
int32_t atn_save_iterate(const char* path, const char** names,
                         const double** arrs, const int64_t* sizes,
                         int32_t n) {
    std::ofstream f(path, std::ios::binary | std::ios::trunc);
    if (!f) return -1;
    uint32_t hdr[3] = {kMagic, kVersion, static_cast<uint32_t>(n)};
    f.write(reinterpret_cast<const char*>(hdr), sizeof(hdr));
    for (int32_t i = 0; i < n; ++i) {
        uint32_t name_len = static_cast<uint32_t>(std::strlen(names[i]));
        f.write(reinterpret_cast<const char*>(&name_len), 4);
        f.write(names[i], name_len);
        uint64_t numel = static_cast<uint64_t>(sizes[i]);
        f.write(reinterpret_cast<const char*>(&numel), 8);
        f.write(reinterpret_cast<const char*>(arrs[i]),
                static_cast<std::streamsize>(numel * sizeof(double)));
    }
    return f.good() ? 0 : -2;
}

// Open + parse; returns handle > 0 or negative error.
int64_t atn_iterate_open(const char* path) {
    std::ifstream f(path, std::ios::binary);
    if (!f) return -1;
    uint32_t hdr[3];
    f.read(reinterpret_cast<char*>(hdr), sizeof(hdr));
    if (!f || hdr[0] != kMagic || hdr[1] != kVersion) return -2;
    IterateFile it;
    for (uint32_t i = 0; i < hdr[2]; ++i) {
        uint32_t name_len = 0;
        f.read(reinterpret_cast<char*>(&name_len), 4);
        if (!f || name_len > 4096) return -3;
        std::string name(name_len, '\0');
        f.read(&name[0], name_len);
        uint64_t numel = 0;
        f.read(reinterpret_cast<char*>(&numel), 8);
        if (!f || numel > (1ull << 34)) return -3;
        std::vector<double> d(numel);
        f.read(reinterpret_cast<char*>(d.data()),
               static_cast<std::streamsize>(numel * sizeof(double)));
        if (!f) return -3;
        it.names.push_back(std::move(name));
        it.data.push_back(std::move(d));
    }
    std::lock_guard<std::mutex> lk(g_mutex);
    int64_t h = g_next_handle++;
    g_handles[h] = std::move(it);
    return h;
}

int32_t atn_iterate_count(int64_t h) {
    std::lock_guard<std::mutex> lk(g_mutex);
    auto it = g_handles.find(h);
    if (it == g_handles.end()) return -1;
    return static_cast<int32_t>(it->second.names.size());
}

int32_t atn_iterate_name(int64_t h, int32_t i, char* buf, int32_t buflen) {
    std::lock_guard<std::mutex> lk(g_mutex);
    auto it = g_handles.find(h);
    if (it == g_handles.end() || i < 0 ||
        i >= static_cast<int32_t>(it->second.names.size()))
        return -1;
    const std::string& s = it->second.names[i];
    if (static_cast<int32_t>(s.size()) + 1 > buflen) return -2;
    std::memcpy(buf, s.c_str(), s.size() + 1);
    return static_cast<int32_t>(s.size());
}

int64_t atn_iterate_size(int64_t h, int32_t i) {
    std::lock_guard<std::mutex> lk(g_mutex);
    auto it = g_handles.find(h);
    if (it == g_handles.end() || i < 0 ||
        i >= static_cast<int32_t>(it->second.data.size()))
        return -1;
    return static_cast<int64_t>(it->second.data[i].size());
}

int32_t atn_iterate_data(int64_t h, int32_t i, double* out) {
    std::lock_guard<std::mutex> lk(g_mutex);
    auto it = g_handles.find(h);
    if (it == g_handles.end() || i < 0 ||
        i >= static_cast<int32_t>(it->second.data.size()))
        return -1;
    const auto& d = it->second.data[i];
    std::memcpy(out, d.data(), d.size() * sizeof(double));
    return 0;
}

int32_t atn_iterate_close(int64_t h) {
    std::lock_guard<std::mutex> lk(g_mutex);
    return g_handles.erase(h) ? 0 : -1;
}

}  // extern "C"

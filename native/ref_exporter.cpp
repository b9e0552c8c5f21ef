// Reference-format binary field codec (native).
//
// Implements the exact on-disk format of the reference's Exporter
// (reference: core/src/exporter.cpp:30-233): a sequence of records, each an
// int32 element count followed by that many little-endian values of the
// record's type (float32 / float64 / int32); the accompanying text .dat
// record file ("Name type size min max" per line) is handled by the Python
// wrapper. This lets nextsim_tpu write snapshots and restarts that the
// reference's own Matlab/Python readers (matlab/neXtSIM_bin_revert.m)
// consume, and read reference outputs for cross-validation.
//
// Built as a small shared library driven through ctypes
// (nextsim_tpu/output/ref_binary.py). Buffered stdio keeps the write path
// at disk speed without any Python per-record overhead.

#include <cstdio>
#include <cstdint>
#include <cstring>

extern "C" {

void* rxw_open(const char* path) { return std::fopen(path, "wb"); }

void rxw_close(void* f) {
    if (f) std::fclose(static_cast<FILE*>(f));
}

// Write one record of float32 values (optionally converting from float64,
// mirroring Exporter::writeContainer's precision handling).
int rxw_write_floats(void* fv, const float* data, int32_t n) {
    FILE* f = static_cast<FILE*>(fv);
    if (!f) return -1;
    if (std::fwrite(&n, sizeof(int32_t), 1, f) != 1) return -1;
    if (n > 0 && std::fwrite(data, sizeof(float), n, f) != (size_t)n) return -1;
    return 0;
}

int rxw_write_doubles(void* fv, const double* data, int32_t n) {
    FILE* f = static_cast<FILE*>(fv);
    if (!f) return -1;
    if (std::fwrite(&n, sizeof(int32_t), 1, f) != 1) return -1;
    if (n > 0 && std::fwrite(data, sizeof(double), n, f) != (size_t)n) return -1;
    return 0;
}

int rxw_write_ints(void* fv, const int32_t* data, int32_t n) {
    FILE* f = static_cast<FILE*>(fv);
    if (!f) return -1;
    if (std::fwrite(&n, sizeof(int32_t), 1, f) != 1) return -1;
    if (n > 0 && std::fwrite(data, sizeof(int32_t), n, f) != (size_t)n) return -1;
    return 0;
}

// --- reading ---------------------------------------------------------------

void* rxr_open(const char* path) { return std::fopen(path, "rb"); }

void rxr_close(void* f) {
    if (f) std::fclose(static_cast<FILE*>(f));
}

// Returns the element count of the record at the current position (and
// leaves the stream positioned at the payload), or -1 at EOF/error.
int32_t rxr_record_size(void* fv) {
    FILE* f = static_cast<FILE*>(fv);
    int32_t n;
    if (std::fread(&n, sizeof(int32_t), 1, f) != 1) return -1;
    return n;
}

int rxr_read_floats(void* fv, float* out, int32_t n) {
    FILE* f = static_cast<FILE*>(fv);
    return std::fread(out, sizeof(float), n, f) == (size_t)n ? 0 : -1;
}

int rxr_read_doubles(void* fv, double* out, int32_t n) {
    FILE* f = static_cast<FILE*>(fv);
    return std::fread(out, sizeof(double), n, f) == (size_t)n ? 0 : -1;
}

int rxr_read_ints(void* fv, int32_t* out, int32_t n) {
    FILE* f = static_cast<FILE*>(fv);
    return std::fread(out, sizeof(int32_t), n, f) == (size_t)n ? 0 : -1;
}

int rxr_skip(void* fv, int64_t bytes) {
    FILE* f = static_cast<FILE*>(fv);
    return std::fseek(f, (long)bytes, SEEK_CUR);
}

}  // extern "C"

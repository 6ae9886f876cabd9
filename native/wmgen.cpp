// wmgen — native watermark matrix generator.
//
// Same CLI contract as the reference generator
// (/root/reference/CommonRandomMatrix/main.cpp:16-68):
//     wmgen <rows> <cols> <seed> <output_file> [threads]
// writes rows*cols little-endian float32 N(0,1) values.
//
// Differences, documented: the distribution algorithm is pinned here
// (std::mt19937 + Box-Muller) so output is reproducible across compilers —
// the C++ standard leaves std::normal_distribution's algorithm unspecified,
// so bit-parity with the reference's MSVC build is not possible from source.
// The optional [threads] argument reproduces the reference's quirk of
// seeding every thread with the same seed (each thread's chunk restarts the
// stream); default 1 thread gives one clean stream.
//
// Build: make -C native wmgen

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <thread>
#include <vector>

namespace {

// Deterministic Box-Muller over the pinned mt19937 stream.
void fill_normal(std::vector<float>& out, size_t start, size_t end,
                 uint32_t seed) {
    std::mt19937 gen(seed);
    const double two_pi = 6.283185307179586476925286766559;
    size_t i = start;
    while (i < end) {
        // u1 in (0,1], u2 in [0,1)
        double u1 = (static_cast<double>(gen()) + 1.0) / 4294967296.0;
        double u2 = static_cast<double>(gen()) / 4294967296.0;
        double r = std::sqrt(-2.0 * std::log(u1));
        out[i++] = static_cast<float>(r * std::cos(two_pi * u2));
        if (i < end)
            out[i++] = static_cast<float>(r * std::sin(two_pi * u2));
    }
}

}  // namespace

int main(int argc, char** argv) {
    if (argc != 5 && argc != 6) {
        std::fprintf(stderr,
                     "Usage: %s <rows> <cols> <seed> <output_file> "
                     "[threads]\n", argv[0]);
        return EXIT_FAILURE;
    }
    const long rows = std::strtol(argv[1], nullptr, 10);
    const long cols = std::strtol(argv[2], nullptr, 10);
    const unsigned long seed = std::strtoul(argv[3], nullptr, 10);
    const char* filename = argv[4];
    const int threads = argc == 6 ? std::atoi(argv[5]) : 1;
    if (rows <= 0 || cols <= 0 || rows >= 32768 || cols >= 32768) {
        std::fprintf(stderr, "Rows and columns must be positive integers "
                             "less than 32768.\n");
        return EXIT_FAILURE;
    }
    const size_t n = static_cast<size_t>(rows) * static_cast<size_t>(cols);
    std::vector<float> values(n);

    if (threads <= 1) {
        fill_normal(values, 0, n, static_cast<uint32_t>(seed));
    } else {
        // reference quirk emulation: every worker restarts the same stream
        std::vector<std::thread> pool;
        const size_t chunk = n / threads;
        for (int t = 0; t < threads; t++) {
            size_t start = static_cast<size_t>(t) * chunk;
            size_t end = (t == threads - 1) ? n : start + chunk;
            pool.emplace_back([&values, start, end, seed] {
                std::vector<float> local(end - start);
                fill_normal(local, 0, end - start,
                            static_cast<uint32_t>(seed));
                for (size_t i = start; i < end; i++)
                    values[i] = local[i - start];
            });
        }
        for (auto& th : pool) th.join();
    }

    FILE* f = std::fopen(filename, "wb");
    if (!f) {
        std::fprintf(stderr, "Error: Unable to open file %s for writing.\n",
                     filename);
        return EXIT_FAILURE;
    }
    const size_t written = std::fwrite(values.data(), sizeof(float), n, f);
    std::fclose(f);
    if (written != n) {
        std::fprintf(stderr, "Error: Failed to write data to %s.\n",
                     filename);
        return EXIT_FAILURE;
    }
    std::printf("Successfully wrote %ld random floats to %s.\n",
                static_cast<long>(n), filename);
    return EXIT_SUCCESS;
}

// Native binfile container loader (iden3 format).
//
// TPU-framework equivalent of the reference's C++ data-loading layer
// /root/reference/src/binfile_utils.{hpp,cpp}: open + validate + section
// table + zero-copy payload pointers. Differences by design:
//   * mmap(MAP_POPULATE) and KEEP the map (the reference memcpys the
//     whole file into one malloc block, binfile_utils.cpp:28-31 — that
//     doubles RSS for tens-of-GB zkeys; device uploads stream straight
//     from the page cache instead),
//   * optional multi-threaded prefault (touch pages in parallel) so a
//     cold 2^24-scale zkey loads at disk/page-cache speed instead of
//     single-thread fault speed,
//   * C ABI for ctypes (no pybind11 in this environment).
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <pthread.h>
#include <string>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#include <vector>

namespace {

struct Section {
    uint32_t type;
    uint64_t offset;  // payload offset from file start
    uint64_t size;
};

struct BinFile {
    int fd = -1;
    uint8_t *map = nullptr;
    uint64_t size = 0;
    uint32_t version = 0;
    char magic[5] = {0};
    std::vector<Section> sections;
    std::string error;
};

struct PrefaultArg {
    const uint8_t *base;
    uint64_t size;
};

void *prefault_worker(void *p) {
    auto *a = static_cast<PrefaultArg *>(p);
    volatile uint64_t sink = 0;
    for (uint64_t off = 0; off < a->size; off += 4096)
        sink += a->base[off];
    (void)sink;
    return nullptr;
}

}  // namespace

extern "C" {

// Returns a handle (opaque pointer) or nullptr. On nullptr, the error
// can be fetched with bf_last_error (thread-local).
static thread_local std::string g_error;

const char *bf_last_error() { return g_error.c_str(); }

void *bf_open(const char *path, const char *expected_type,
              uint32_t max_version, int prefault_threads) {
    auto bf = new BinFile();
    bf->fd = open(path, O_RDONLY);
    if (bf->fd < 0) {
        g_error = std::string("cannot open ") + path;
        delete bf;
        return nullptr;
    }
    struct stat st;
    if (fstat(bf->fd, &st) != 0 || st.st_size < 12) {
        g_error = "stat failed or file too small";
        close(bf->fd);
        delete bf;
        return nullptr;
    }
    bf->size = static_cast<uint64_t>(st.st_size);
    bf->map = static_cast<uint8_t *>(
        mmap(nullptr, bf->size, PROT_READ, MAP_PRIVATE, bf->fd, 0));
    if (bf->map == MAP_FAILED) {
        g_error = "mmap failed";
        close(bf->fd);
        delete bf;
        return nullptr;
    }
    madvise(bf->map, bf->size, MADV_WILLNEED);

    memcpy(bf->magic, bf->map, 4);
    if (expected_type && strncmp(bf->magic, expected_type, 4) != 0) {
        // message format matches binfile_utils.cpp:38-40
        g_error = std::string("Invalid file type. It should be ") +
                  expected_type + " and it is " + bf->magic;
        munmap(bf->map, bf->size);
        close(bf->fd);
        delete bf;
        return nullptr;
    }
    memcpy(&bf->version, bf->map + 4, 4);
    if (bf->version > max_version) {
        g_error = "Invalid version. It should be <=" +
                  std::to_string(max_version) + " and it is " +
                  std::to_string(bf->version);
        munmap(bf->map, bf->size);
        close(bf->fd);
        delete bf;
        return nullptr;
    }
    uint32_t n_sections = 0;
    memcpy(&n_sections, bf->map + 8, 4);

    uint64_t pos = 12;
    for (uint32_t i = 0; i < n_sections; i++) {
        if (pos + 12 > bf->size) {
            g_error = "truncated section table";
            munmap(bf->map, bf->size);
            close(bf->fd);
            delete bf;
            return nullptr;
        }
        Section s;
        memcpy(&s.type, bf->map + pos, 4);
        memcpy(&s.size, bf->map + pos + 4, 8);
        s.offset = pos + 12;
        if (s.offset + s.size > bf->size) {
            g_error = "section overruns file";
            munmap(bf->map, bf->size);
            close(bf->fd);
            delete bf;
            return nullptr;
        }
        bf->sections.push_back(s);
        pos = s.offset + s.size;
    }

    if (prefault_threads > 1) {
        // parallel page-touch: cold-cache load at NVMe bandwidth
        int nt = prefault_threads;
        std::vector<pthread_t> threads(nt);
        std::vector<PrefaultArg> args(nt);
        uint64_t chunk = (bf->size + nt - 1) / nt;
        for (int t = 0; t < nt; t++) {
            uint64_t begin = t * chunk;
            uint64_t len = begin >= bf->size
                               ? 0
                               : std::min(chunk, bf->size - begin);
            args[t] = {bf->map + begin, len};
            pthread_create(&threads[t], nullptr, prefault_worker, &args[t]);
        }
        for (int t = 0; t < nt; t++) pthread_join(threads[t], nullptr);
    }
    return bf;
}

uint32_t bf_version(void *h) { return static_cast<BinFile *>(h)->version; }

uint64_t bf_file_size(void *h) { return static_cast<BinFile *>(h)->size; }

int32_t bf_n_sections(void *h) {
    return static_cast<int32_t>(static_cast<BinFile *>(h)->sections.size());
}

// idx-th section in file order; returns 0 on success.
int32_t bf_section_info(void *h, int32_t idx, uint32_t *type,
                        uint64_t *offset, uint64_t *size) {
    auto bf = static_cast<BinFile *>(h);
    if (idx < 0 || idx >= static_cast<int32_t>(bf->sections.size()))
        return -1;
    *type = bf->sections[idx].type;
    *offset = bf->sections[idx].offset;
    *size = bf->sections[idx].size;
    return 0;
}

const uint8_t *bf_base(void *h) { return static_cast<BinFile *>(h)->map; }

void bf_close(void *h) {
    auto bf = static_cast<BinFile *>(h);
    if (bf->map) munmap(bf->map, bf->size);
    if (bf->fd >= 0) close(bf->fd);
    delete bf;
}

}  // extern "C"

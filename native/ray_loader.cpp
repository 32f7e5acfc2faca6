// Native ray-batch loader: the TPU-native replacement for the reference's
// managed data path (ScratchNerf/BinDataset.cs).
//
// The reference opens the dump file and issues 1024 random 64-byte reads per
// batch on the training thread (BinDataset.cs:27-52) — I/O-bound by design,
// with a one-batch Peek/Next lookahead (BinDataset.cs:17-25). This loader:
//
//   * mmaps the whole record file once (the OS page cache is the only copy);
//   * samples batches with replacement from a per-loader PCG64 stream
//     (seeded, host-stripeable for multi-host training);
//   * gathers the AoS 64-byte records into SoA float arrays (origins,
//     directions, viewdirs, radius, near, far, lossmult, pixels) — the
//     layout jax wants, so the device upload is 8 contiguous memcpys;
//   * runs N worker threads filling a ring of prefetched batches, so the
//     training loop never waits on gather/IO (generalizing Peek/Next).
//
// Record layout (BinDataset.cs:40-49): 16 little-endian f32 =
// origin(3) direction(3) viewdir(3) radius near far lossMult pixel(3).
//
// C ABI (consumed via ctypes from datasets/native_loader.py):
//   void* rayloader_open(const char* path, int batch, uint64_t seed,
//                        int stripe_index, int stripe_count, int slots,
//                        int workers);
//   long  rayloader_num_records(void* h);
//   int   rayloader_next(void* h, float* origins, float* directions,
//                        float* viewdirs, float* radii, float* near,
//                        float* far, float* lossmult, float* pixels);
//   void  rayloader_close(void* h);

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr int kRecordFloats = 16;

// xoshiro256** — small, fast, seedable PRNG (public-domain algorithm).
struct Rng {
  uint64_t s[4];
  explicit Rng(uint64_t seed) {
    // splitmix64 seeding
    for (int i = 0; i < 4; ++i) {
      seed += 0x9E3779B97f4A7C15ULL;
      uint64_t z = seed;
      z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
      z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
      s[i] = z ^ (z >> 31);
    }
  }
  static uint64_t rotl(uint64_t x, int k) { return (x << k) | (x >> (64 - k)); }
  uint64_t next() {
    uint64_t result = rotl(s[1] * 5, 7) * 9;
    uint64_t t = s[1] << 17;
    s[2] ^= s[0];
    s[3] ^= s[1];
    s[1] ^= s[2];
    s[0] ^= s[3];
    s[2] ^= t;
    s[3] = rotl(s[3], 45);
    return result;
  }
  // uniform in [0, n) without modulo bias (Lemire)
  uint64_t bounded(uint64_t n) {
    __uint128_t m = (__uint128_t)next() * n;
    uint64_t lo = (uint64_t)m;
    if (lo < n) {
      uint64_t t = (-n) % n;
      while (lo < t) {
        m = (__uint128_t)next() * n;
        lo = (uint64_t)m;
      }
    }
    return (uint64_t)(m >> 64);
  }
};

struct Batch {
  std::vector<float> origins, directions, viewdirs;
  std::vector<float> radii, near, far, lossmult, pixels;
  void resize(int batch) {
    origins.resize(batch * 3);
    directions.resize(batch * 3);
    viewdirs.resize(batch * 3);
    radii.resize(batch);
    near.resize(batch);
    far.resize(batch);
    lossmult.resize(batch);
    pixels.resize(batch * 3);
  }
};

struct Loader {
  const float* data = nullptr;  // mmapped base
  size_t map_bytes = 0;
  int fd = -1;
  int64_t num_records = 0;
  int batch = 0;
  int64_t stripe_index = 0, stripe_count = 1;

  // ring of prefetched batches
  std::vector<Batch> ring;
  std::vector<int> ready;  // slot states: 0 empty, 1 filling, 2 full
  std::mutex mu;
  std::condition_variable cv_full, cv_empty;
  uint64_t fill_seq = 0;   // next slot to fill = fill_seq % slots
  uint64_t drain_seq = 0;  // next slot to drain
  std::atomic<bool> stop{false};
  std::vector<std::thread> workers;
  std::mutex rng_mu;
  Rng rng{0};

  ~Loader() {
    stop.store(true);
    cv_empty.notify_all();
    cv_full.notify_all();
    for (auto& t : workers) t.join();
    if (data) munmap((void*)data, map_bytes);
    if (fd >= 0) close(fd);
  }

  void fill(Batch& b) {
    // Draw indices under the rng lock; gather outside it.
    std::vector<int64_t> idx(batch);
    {
      std::lock_guard<std::mutex> lk(rng_mu);
      // Stripe: record r belongs to this host iff r % stripe_count ==
      // stripe_index; sample within the stripe.
      int64_t stripe_len = (num_records - stripe_index + stripe_count - 1) /
                           stripe_count;
      for (int i = 0; i < batch; ++i) {
        int64_t k = (int64_t)rng.bounded((uint64_t)stripe_len);
        idx[i] = stripe_index + k * stripe_count;
      }
    }
    for (int i = 0; i < batch; ++i) {
      const float* r = data + idx[i] * kRecordFloats;
      std::memcpy(&b.origins[i * 3], r + 0, 3 * sizeof(float));
      std::memcpy(&b.directions[i * 3], r + 3, 3 * sizeof(float));
      std::memcpy(&b.viewdirs[i * 3], r + 6, 3 * sizeof(float));
      b.radii[i] = r[9];
      b.near[i] = r[10];
      b.far[i] = r[11];
      b.lossmult[i] = r[12];
      std::memcpy(&b.pixels[i * 3], r + 13, 3 * sizeof(float));
    }
  }

  void worker_loop() {
    while (!stop.load()) {
      uint64_t slot;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_empty.wait(lk, [&] {
          return stop.load() ||
                 (fill_seq - drain_seq < ring.size() &&
                  ready[fill_seq % ring.size()] == 0);
        });
        if (stop.load()) return;
        slot = fill_seq++ % ring.size();
        ready[slot] = 1;
      }
      fill(ring[slot]);
      {
        std::lock_guard<std::mutex> lk(mu);
        ready[slot] = 2;
      }
      cv_full.notify_all();
    }
  }
};

}  // namespace

extern "C" {

void* rayloader_open(const char* path, int batch, uint64_t seed,
                     int stripe_index, int stripe_count, int slots,
                     int num_workers) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size == 0 ||
      st.st_size % (kRecordFloats * sizeof(float)) != 0) {
    close(fd);
    return nullptr;
  }
  void* map = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (map == MAP_FAILED) {
    close(fd);
    return nullptr;
  }
  madvise(map, st.st_size, MADV_RANDOM);

  auto* L = new Loader();
  L->fd = fd;
  L->data = (const float*)map;
  L->map_bytes = st.st_size;
  L->num_records = st.st_size / (kRecordFloats * sizeof(float));
  L->batch = batch;
  L->stripe_index = stripe_index;
  L->stripe_count = stripe_count < 1 ? 1 : stripe_count;
  L->rng = Rng(seed);
  if (slots < 2) slots = 2;
  L->ring.resize(slots);
  for (auto& b : L->ring) b.resize(batch);
  L->ready.assign(slots, 0);
  if (num_workers < 1) num_workers = 1;
  for (int i = 0; i < num_workers; ++i)
    L->workers.emplace_back([L] { L->worker_loop(); });
  return L;
}

long rayloader_num_records(void* h) {
  return h ? (long)((Loader*)h)->num_records : -1;
}

int rayloader_next(void* h, float* origins, float* directions,
                   float* viewdirs, float* radii, float* near, float* far,
                   float* lossmult, float* pixels) {
  if (!h) return -1;
  auto* L = (Loader*)h;
  uint64_t slot;
  {
    std::unique_lock<std::mutex> lk(L->mu);
    L->cv_full.wait(lk, [&] {
      return L->stop.load() || L->ready[L->drain_seq % L->ring.size()] == 2;
    });
    if (L->stop.load()) return -1;
    slot = L->drain_seq % L->ring.size();
  }
  Batch& b = L->ring[slot];
  int n = L->batch;
  std::memcpy(origins, b.origins.data(), n * 3 * sizeof(float));
  std::memcpy(directions, b.directions.data(), n * 3 * sizeof(float));
  std::memcpy(viewdirs, b.viewdirs.data(), n * 3 * sizeof(float));
  std::memcpy(radii, b.radii.data(), n * sizeof(float));
  std::memcpy(near, b.near.data(), n * sizeof(float));
  std::memcpy(far, b.far.data(), n * sizeof(float));
  std::memcpy(lossmult, b.lossmult.data(), n * sizeof(float));
  std::memcpy(pixels, b.pixels.data(), n * 3 * sizeof(float));
  {
    std::lock_guard<std::mutex> lk(L->mu);
    L->ready[slot] = 0;
    L->drain_seq++;
  }
  L->cv_empty.notify_all();
  return n;
}

void rayloader_close(void* h) { delete (Loader*)h; }

}  // extern "C"

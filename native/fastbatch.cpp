// fastbatch: native batch assembly for the training data pipeline.
//
// TPU-native equivalent of the host hot loop in the reference's
// dataset.py::loadBatches (SURVEY.md §3.2 "hot loop #1": segment slicing +
// copy + scale). The Python pipeline calls this through ctypes
// (convsep_tpu/data/fastbatch.py); each batch item is an independent
// (time_context × feat) window copied out of a memory-mapped track with
// zero tail padding and the mult-factor scale fused into the copy. Items
// are partitioned across a std::thread pool — with mmap'd feature files the
// wall time is page-fault bound, and parallel faulting hides disk/page
// latency behind the accelerator step.
//
// ABI (kept C, stable for ctypes):
//   assemble_batch(tracks, track_frames, n_tracks,
//                  seg_track, seg_start, batch,
//                  T, F, scale, out, n_threads)
//
// tracks:       array of n_tracks float* (track spectrograms, row-major
//               frames × F)
// track_frames: frames per track
// seg_track/seg_start: per batch item, which track and which start frame
// out:          batch × T × F float32, fully overwritten

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

void assemble_batch(const float** tracks, const int64_t* track_frames,
                    int64_t n_tracks, const int64_t* seg_track,
                    const int64_t* seg_start, int64_t batch, int64_t T,
                    int64_t F, float scale, float* out, int64_t n_threads) {
  if (n_threads <= 0) {
    n_threads = static_cast<int64_t>(std::thread::hardware_concurrency());
    if (n_threads <= 0) n_threads = 1;
  }
  n_threads = std::min<int64_t>(n_threads, batch > 0 ? batch : 1);

  auto work = [=](int64_t begin, int64_t end) {
    for (int64_t b = begin; b < end; ++b) {
      const int64_t ti = seg_track[b];
      const int64_t start = seg_start[b];
      float* dst = out + b * T * F;
      // defensive: zero-fill bad track indices AND negative starts — a
      // negative start would otherwise read before the track buffer (this
      // is a public ctypes ABI; don't trust the caller)
      if (ti < 0 || ti >= n_tracks || start < 0) {
        std::memset(dst, 0, sizeof(float) * T * F);
        continue;
      }
      const float* src = tracks[ti];
      const int64_t nf = track_frames[ti];
      const int64_t avail =
          std::max<int64_t>(0, std::min<int64_t>(T, nf - start));
      const float* row = src + start * F;
      if (scale == 1.0f) {
        std::memcpy(dst, row, sizeof(float) * avail * F);
      } else {
        for (int64_t i = 0; i < avail * F; ++i) dst[i] = row[i] * scale;
      }
      if (avail < T)
        std::memset(dst + avail * F, 0, sizeof(float) * (T - avail) * F);
    }
  };

  if (n_threads == 1 || batch < 4) {
    work(0, batch);
    return;
  }
  std::vector<std::thread> pool;
  pool.reserve(n_threads);
  const int64_t chunk = (batch + n_threads - 1) / n_threads;
  for (int64_t t = 0; t < n_threads; ++t) {
    const int64_t begin = t * chunk;
    const int64_t end = std::min(batch, begin + chunk);
    if (begin >= end) break;
    pool.emplace_back(work, begin, end);
  }
  for (auto& th : pool) th.join();
}

int64_t fastbatch_abi_version() { return 1; }

}  // extern "C"

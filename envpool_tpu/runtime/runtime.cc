// Host-side async environment executor (native runtime).
//
// TPU-native envs run on-device (envpool_tpu/core/engine.py); this module is
// the native host fallback for environments that cannot be expressed as JAX
// programs — the same role the reference's C++ engine plays for all envs
// (envpool/core/async_envpool.h:43-238, action_buffer_queue.h,
// state_buffer_queue.h).  Design mirrors the reference's behavior, not its
// code: a worker thread pool consumes (env_id, force_reset) slices from a
// bounded MPMC action queue; envs write float state rows into a shared
// batch buffer; recv blocks until batch_size rows have landed.
//
// Exposed as a C ABI for ctypes (no pybind11 in this image).  Env logic is
// pluggable via a C callback:
//   step_fn(ctx, env_id, reset, action_ptr, state_ptr) -> done flag
// A built-in vectorized CartPole (step_fn == nullptr) exercises the
// executor end-to-end and doubles as the CPU comparator for benchmarks.

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <map>
#include <mutex>
#include <random>
#include <thread>
#include <vector>

namespace {

using StepFn = int (*)(void* ctx, int env_id, int reset,
                       const float* action, float* state);

struct ActionSlice {
  int env_id;
  int order;       // slot in the output batch; -1 = completion order
  bool force_reset;
};

// Bounded MPMC queue (mutex + condvar; the contention here is negligible
// next to env step time, and this keeps the code portable).
class ActionQueue {
 public:
  void EnqueueBulk(const std::vector<ActionSlice>& slices) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      for (const auto& s : slices) q_.push_back(s);
    }
    cv_.notify_all();
  }
  ActionSlice Dequeue() {
    std::unique_lock<std::mutex> lk(mu_);
    cv_.wait(lk, [&] { return !q_.empty(); });
    ActionSlice s = q_.front();
    q_.pop_front();
    return s;
  }

 private:
  std::mutex mu_;
  std::condition_variable cv_;
  std::deque<ActionSlice> q_;
};

// One batch worth of output rows, written concurrently by workers.
struct StateBuffer {
  std::vector<float> data;     // [batch, state_dim]
  std::vector<int> env_ids;    // [batch]
  std::vector<uint8_t> dones;  // [batch]
  std::atomic<int> count{0};
  int batch = 0;
};

struct BuiltinCartPole {
  double x, x_dot, theta, theta_dot;
  bool done = true;
  int elapsed = 0;
  std::mt19937 gen;
  explicit BuiltinCartPole(int seed) : gen(seed) {}

  void Reset() {
    std::uniform_real_distribution<> d(-0.05, 0.05);
    x = d(gen);
    x_dot = d(gen);
    theta = d(gen);
    theta_dot = d(gen);
    done = false;
    elapsed = 0;
  }
  // Returns reward; sets done.
  float Step(int act, int max_steps) {
    const double g = 9.8, mc = 1.0, mp = 0.1, mt = mc + mp, l = 0.5,
                 mpl = mp * l, fmag = 10.0, tau = 0.02;
    double force = act == 1 ? fmag : -fmag;
    double ct = std::cos(theta), st = std::sin(theta);
    double temp = (force + mpl * theta_dot * theta_dot * st) / mt;
    double tacc = (g * st - ct * temp) / (l * (4.0 / 3.0 - mp * ct * ct / mt));
    double xacc = temp - mpl * tacc * ct / mt;
    x += tau * x_dot;
    x_dot += tau * xacc;
    theta += tau * theta_dot;
    theta_dot += tau * tacc;
    ++elapsed;
    done = elapsed >= max_steps || x < -2.4 || x > 2.4 || theta < -0.2095 ||
           theta > 0.2095;
    return 1.0F;
  }
};

class AsyncExecutor {
 public:
  AsyncExecutor(int num_envs, int batch_size, int num_threads, int state_dim,
                int action_dim, int max_episode_steps, int seed,
                StepFn step_fn, void* ctx)
      : num_envs_(num_envs),
        batch_(batch_size),
        state_dim_(state_dim),
        action_dim_(action_dim),
        max_steps_(max_episode_steps),
        step_fn_(step_fn),
        ctx_(ctx),
        actions_(static_cast<size_t>(num_envs) * action_dim),
        stop_(false) {
    for (int i = 0; i < num_envs; ++i) builtin_.emplace_back(seed + i);
    if (num_threads <= 0) {
      num_threads = static_cast<int>(std::thread::hardware_concurrency());
      if (num_threads > batch_size) num_threads = batch_size;
      if (num_threads < 1) num_threads = 1;
    }
    for (int t = 0; t < num_threads; ++t) {
      workers_.emplace_back([this] { WorkerLoop(); });
    }
  }

  ~AsyncExecutor() {
    stop_.store(true);
    // Poison actions to wake all workers.
    std::vector<ActionSlice> poison(workers_.size(), {-1, -1, false});
    queue_.EnqueueBulk(poison);
    for (auto& w : workers_) w.join();
    for (auto& kv : live_buffers_) delete kv.second;
    for (auto& kv : done_buffers_) delete kv.second;
  }

  void Send(const int* env_ids, const float* actions, int n, int force_reset) {
    std::vector<ActionSlice> slices(n);
    bool sync = (batch_ == num_envs_);
    for (int i = 0; i < n; ++i) {
      int eid = env_ids[i];
      if (actions != nullptr) {
        std::memcpy(&actions_[static_cast<size_t>(eid) * action_dim_],
                    &actions[static_cast<size_t>(i) * action_dim_],
                    sizeof(float) * action_dim_);
      }
      slices[i] = {eid, sync ? i : -1, force_reset != 0};
    }
    queue_.EnqueueBulk(slices);
  }

  // Blocks until the next full batch (in allocation order) is ready.
  int Recv(float* states, int* env_ids, uint8_t* dones) {
    StateBuffer* buf = nullptr;
    {
      std::unique_lock<std::mutex> lk(recv_mu_);
      recv_cv_.wait(lk, [&] {
        return !done_buffers_.empty() &&
               done_buffers_.front().first == next_recv_;
      });
      buf = done_buffers_.front().second;
      done_buffers_.pop_front();
      ++next_recv_;
    }
    std::memcpy(states, buf->data.data(),
                sizeof(float) * buf->batch * state_dim_);
    std::memcpy(env_ids, buf->env_ids.data(), sizeof(int) * buf->batch);
    std::memcpy(dones, buf->dones.data(), sizeof(uint8_t) * buf->batch);
    int n = buf->batch;
    delete buf;
    return n;
  }

 private:
  StateBuffer* NewBuffer() {
    auto* b = new StateBuffer();
    b->batch = batch_;
    b->data.resize(static_cast<size_t>(batch_) * state_dim_);
    b->env_ids.resize(batch_);
    b->dones.resize(batch_);
    return b;
  }

  void WorkerLoop() {
    // Per-worker scratch row sized to the actual state_dim (a fixed
    // float[64] silently corrupted memory for state_dim > 64).
    std::vector<float> row(static_cast<size_t>(state_dim_));
    while (true) {
      ActionSlice s = queue_.Dequeue();
      if (s.env_id < 0 || stop_.load()) return;
      uint8_t done_flag = 0;
      const float* act = &actions_[static_cast<size_t>(s.env_id) * action_dim_];
      if (step_fn_ != nullptr) {
        int reset = s.force_reset ? 1 : 0;
        int rc = step_fn_(ctx_, s.env_id, reset, act, row.data());
        if (rc < 0) {
          // Failure detection: a crashing env must not hang recv (the
          // reference has no story here — a crashed env kills the
          // process, async_envpool.h worker loop).  Record the failed
          // env, emit a zeroed terminal row so the batch completes, and
          // let the wrapper surface the error on the next recv.
          {
            std::lock_guard<std::mutex> lk(recv_mu_);
            errors_.push_back(s.env_id);
          }
          std::fill(row.begin(), row.end(), 0.0F);
          rc = 1;
        }
        done_flag = static_cast<uint8_t>(rc);
      } else {
        auto& env = builtin_[s.env_id];
        bool reset = s.force_reset || env.done;
        float reward = 0.0F;
        if (reset) {
          env.Reset();
        } else {
          reward = env.Step(static_cast<int>(act[0]), max_steps_);
        }
        row[0] = static_cast<float>(env.x);
        row[1] = static_cast<float>(env.x_dot);
        row[2] = static_cast<float>(env.theta);
        row[3] = static_cast<float>(env.theta_dot);
        row[4] = reward;
        done_flag = env.done ? 1 : 0;
      }
      // Claim a completion-order slot; allocation index maps uniquely to
      // a (buffer, slot) pair, so any number of batches can be in flight
      // (the reference pipelines buffers the same way,
      // state_buffer_queue.h:123-137).  The Python wrapper reorders rows
      // by env_id in sync mode.
      uint64_t a = alloc_.fetch_add(1, std::memory_order_acq_rel);
      uint64_t bidx = a / batch_;
      int slot = static_cast<int>(a % batch_);
      StateBuffer* buf = GetBuffer(bidx);
      std::memcpy(&buf->data[static_cast<size_t>(slot) * state_dim_],
                  row.data(), sizeof(float) * state_dim_);
      buf->env_ids[slot] = s.env_id;
      buf->dones[slot] = done_flag;
      int finished = buf->count.fetch_add(1, std::memory_order_acq_rel) + 1;
      if (finished == batch_) {
        std::lock_guard<std::mutex> lk(recv_mu_);
        live_buffers_.erase(bidx);
        // Keep done buffers sorted by index for in-order recv.
        auto it = done_buffers_.begin();
        while (it != done_buffers_.end() && it->first < bidx) ++it;
        done_buffers_.insert(it, {bidx, buf});
        recv_cv_.notify_all();
      }
    }
  }

  int num_envs_, batch_, state_dim_, action_dim_, max_steps_;
  StepFn step_fn_;
  void* ctx_;
  StateBuffer* GetBuffer(uint64_t bidx) {
    std::lock_guard<std::mutex> lk(recv_mu_);
    auto it = live_buffers_.find(bidx);
    if (it != live_buffers_.end()) return it->second;
    StateBuffer* b = NewBuffer();
    live_buffers_[bidx] = b;
    return b;
  }

 public:
  // Pops one recorded env failure; returns the env_id or -1 when none.
  int PopError() {
    std::lock_guard<std::mutex> lk(recv_mu_);
    if (errors_.empty()) return -1;
    int eid = errors_.front();
    errors_.pop_front();
    return eid;
  }

 private:
  std::deque<int> errors_;
  std::vector<float> actions_;
  std::vector<BuiltinCartPole> builtin_;
  ActionQueue queue_;
  std::atomic<uint64_t> alloc_{0};
  uint64_t next_recv_ = 0;
  std::map<uint64_t, StateBuffer*> live_buffers_;
  std::deque<std::pair<uint64_t, StateBuffer*>> done_buffers_;
  std::mutex recv_mu_;
  std::condition_variable recv_cv_;
  std::vector<std::thread> workers_;
  std::atomic<bool> stop_;
};

}  // namespace

extern "C" {

void* exec_create(int num_envs, int batch_size, int num_threads,
                  int state_dim, int action_dim, int max_episode_steps,
                  int seed, StepFn step_fn, void* ctx) {
  return new AsyncExecutor(num_envs, batch_size, num_threads, state_dim,
                           action_dim, max_episode_steps, seed, step_fn, ctx);
}

void exec_destroy(void* h) { delete static_cast<AsyncExecutor*>(h); }

void exec_send(void* h, const int* env_ids, const float* actions, int n,
               int force_reset) {
  static_cast<AsyncExecutor*>(h)->Send(env_ids, actions, n, force_reset);
}

int exec_recv(void* h, float* states, int* env_ids, uint8_t* dones) {
  return static_cast<AsyncExecutor*>(h)->Recv(states, env_ids, dones);
}

int exec_pop_error(void* h) {
  return static_cast<AsyncExecutor*>(h)->PopError();
}

}  // extern "C"

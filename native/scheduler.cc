// Continuous-batching scheduler core for the palu_tpu serving runtime.
//
// The reference has no serving stack (single-GPU research scripts only,
// SURVEY.md section 2.3); this is new TPU-first runtime machinery: the
// engine exposes a fixed number of batch lanes (a static-shape jitted decode
// step over B lanes), and this scheduler owns the request lifecycle --
// admission queue, lane allocation, per-lane progress, eviction on
// completion -- off the Python hot loop. Exposed through a plain C ABI and
// bound via ctypes (palu_tpu/runtime/serving.py).
//
// Build: see native/Makefile (g++ -O2 -shared -fPIC).

#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <unordered_map>
#include <vector>

namespace {

enum class RequestState : int32_t {
  kQueued = 0,
  kRunning = 1,
  kFinished = 2,
  kCancelled = 3,
};

struct Request {
  int64_t id;
  int32_t prompt_len;
  int32_t max_new_tokens;
  int32_t generated = 0;
  int32_t lane = -1;
  RequestState state = RequestState::kQueued;
};

struct Scheduler {
  std::mutex mu;
  int32_t num_lanes;
  int32_t s_max;
  std::deque<int64_t> queue;                    // waiting request ids
  std::vector<int64_t> lanes;                   // lane -> request id (-1 free)
  std::unordered_map<int64_t, Request> requests;
  int64_t total_admitted = 0;
  int64_t total_finished = 0;
  int64_t total_tokens = 0;
};

}  // namespace

extern "C" {

// Opaque handle management -------------------------------------------------

void* palu_sched_create(int32_t num_lanes, int32_t s_max) {
  auto* s = new Scheduler();
  s->num_lanes = num_lanes;
  s->s_max = s_max;
  s->lanes.assign(num_lanes, -1);
  return s;
}

void palu_sched_destroy(void* h) { delete static_cast<Scheduler*>(h); }

// Request lifecycle --------------------------------------------------------

// Returns 0 on success, -1 if the prompt cannot ever fit.
int32_t palu_sched_add(void* h, int64_t id, int32_t prompt_len,
                       int32_t max_new_tokens) {
  auto* s = static_cast<Scheduler*>(h);
  std::lock_guard<std::mutex> lock(s->mu);
  if (prompt_len >= s->s_max) return -1;
  Request r;
  r.id = id;
  r.prompt_len = prompt_len;
  // clamp generation to cache capacity
  int32_t room = s->s_max - prompt_len;
  r.max_new_tokens = max_new_tokens < room ? max_new_tokens : room;
  s->requests[id] = r;
  s->queue.push_back(id);
  s->total_admitted++;
  return 0;
}

int32_t palu_sched_cancel(void* h, int64_t id) {
  auto* s = static_cast<Scheduler*>(h);
  std::lock_guard<std::mutex> lock(s->mu);
  auto it = s->requests.find(id);
  if (it == s->requests.end()) return -1;
  Request& r = it->second;
  if (r.state == RequestState::kRunning && r.lane >= 0) {
    s->lanes[r.lane] = -1;
  }
  r.state = RequestState::kCancelled;
  return 0;
}

// Admission: pops up to max_n queued requests into free lanes. Writes
// (request_id, lane) pairs; returns the count. The caller then prefills
// each request into its lane.
int32_t palu_sched_admit(void* h, int64_t* out_ids, int32_t* out_lanes,
                         int32_t max_n) {
  auto* s = static_cast<Scheduler*>(h);
  std::lock_guard<std::mutex> lock(s->mu);
  int32_t n = 0;
  for (int32_t lane = 0; lane < s->num_lanes && n < max_n; ++lane) {
    if (s->lanes[lane] != -1) continue;
    while (!s->queue.empty()) {
      int64_t id = s->queue.front();
      auto it = s->requests.find(id);
      if (it == s->requests.end() ||
          it->second.state != RequestState::kQueued) {
        s->queue.pop_front();
        continue;
      }
      s->queue.pop_front();
      it->second.state = RequestState::kRunning;
      it->second.lane = lane;
      s->lanes[lane] = id;
      out_ids[n] = id;
      out_lanes[n] = lane;
      ++n;
      break;
    }
    if (s->queue.empty() && s->lanes[lane] == -1) break;
  }
  return n;
}

// Which lanes are active this step? Fills lane->request_id (-1 for idle).
int32_t palu_sched_active(void* h, int64_t* lane_ids) {
  auto* s = static_cast<Scheduler*>(h);
  std::lock_guard<std::mutex> lock(s->mu);
  int32_t n = 0;
  for (int32_t lane = 0; lane < s->num_lanes; ++lane) {
    lane_ids[lane] = s->lanes[lane];
    if (s->lanes[lane] != -1) ++n;
  }
  return n;
}

// Report one generated token for a lane. is_eos marks termination by the
// model; the scheduler also terminates at max_new_tokens. Returns 1 if the
// request finished (lane is now free), else 0.
int32_t palu_sched_on_token(void* h, int32_t lane, int32_t is_eos) {
  auto* s = static_cast<Scheduler*>(h);
  std::lock_guard<std::mutex> lock(s->mu);
  int64_t id = s->lanes[lane];
  if (id == -1) return -1;
  Request& r = s->requests[id];
  r.generated++;
  s->total_tokens++;
  if (is_eos || r.generated >= r.max_new_tokens) {
    r.state = RequestState::kFinished;
    r.lane = -1;
    s->lanes[lane] = -1;
    s->total_finished++;
    return 1;
  }
  return 0;
}

int32_t palu_sched_request_state(void* h, int64_t id) {
  auto* s = static_cast<Scheduler*>(h);
  std::lock_guard<std::mutex> lock(s->mu);
  auto it = s->requests.find(id);
  if (it == s->requests.end()) return -1;
  return static_cast<int32_t>(it->second.state);
}

int32_t palu_sched_generated(void* h, int64_t id) {
  auto* s = static_cast<Scheduler*>(h);
  std::lock_guard<std::mutex> lock(s->mu);
  auto it = s->requests.find(id);
  if (it == s->requests.end()) return -1;
  return it->second.generated;
}

int32_t palu_sched_num_queued(void* h) {
  auto* s = static_cast<Scheduler*>(h);
  std::lock_guard<std::mutex> lock(s->mu);
  int32_t n = 0;
  for (int64_t id : s->queue) {
    auto it = s->requests.find(id);
    if (it != s->requests.end() && it->second.state == RequestState::kQueued)
      ++n;
  }
  return n;
}

void palu_sched_stats(void* h, int64_t* admitted, int64_t* finished,
                      int64_t* tokens) {
  auto* s = static_cast<Scheduler*>(h);
  std::lock_guard<std::mutex> lock(s->mu);
  *admitted = s->total_admitted;
  *finished = s->total_finished;
  *tokens = s->total_tokens;
}

}  // extern "C"

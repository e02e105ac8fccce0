"""Continuous-batching serving runtime.

A fixed-lane engine (static-shape jitted decode over B lanes) driven by the
native C++ scheduler (native/scheduler.cc via ctypes; a pure-Python fallback
keeps tests runnable before `make`). Requests are admitted into free lanes,
prefilled with a batch-1 engine sharing the same params, inserted into the
batched cache at their lane, and decoded together; finished lanes are
recycled immediately -- decode never stalls on stragglers.

The reference has no serving stack; this implements the BASELINE north
star's "continuous batching" requirement TPU-first: per-lane cache lengths,
lane insertion via jitted dynamic_update_slice, and all step functions
compiled once.
"""

from __future__ import annotations

import ctypes
import dataclasses
import os
import subprocess
from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .engine import Engine, EngineConfig

__all__ = ["NativeScheduler", "PyScheduler", "ServingEngine", "load_scheduler"]

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")


def _ensure_native_lib() -> Optional[str]:
    """Build (or rebuild) the native scheduler. The .so is not shipped in
    git; it is rebuilt on demand and whenever scheduler.cc is newer than an
    existing binary, so source edits are never silently ignored."""
    so = os.path.join(_NATIVE_DIR, "libpalusched.so")
    src = os.path.join(_NATIVE_DIR, "scheduler.cc")
    if os.path.exists(so) and (
        not os.path.exists(src) or os.path.getmtime(so) >= os.path.getmtime(src)
    ):
        return so
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        return so if os.path.exists(so) else None
    except Exception:
        return so if os.path.exists(so) else None


class NativeScheduler:
    """ctypes binding over native/scheduler.cc."""

    def __init__(self, num_lanes: int, s_max: int, so_path: Optional[str] = None):
        so_path = so_path or _ensure_native_lib()
        if so_path is None:
            raise RuntimeError("native scheduler library unavailable; run make -C native")
        lib = ctypes.CDLL(so_path)
        lib.palu_sched_create.restype = ctypes.c_void_p
        lib.palu_sched_create.argtypes = [ctypes.c_int32, ctypes.c_int32]
        lib.palu_sched_destroy.argtypes = [ctypes.c_void_p]
        lib.palu_sched_add.restype = ctypes.c_int32
        lib.palu_sched_add.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                       ctypes.c_int32, ctypes.c_int32]
        lib.palu_sched_cancel.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.palu_sched_cancel.restype = ctypes.c_int32
        lib.palu_sched_admit.restype = ctypes.c_int32
        lib.palu_sched_admit.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
        lib.palu_sched_active.restype = ctypes.c_int32
        lib.palu_sched_active.argtypes = [ctypes.c_void_p,
                                          ctypes.POINTER(ctypes.c_int64)]
        lib.palu_sched_on_token.restype = ctypes.c_int32
        lib.palu_sched_on_token.argtypes = [ctypes.c_void_p, ctypes.c_int32,
                                            ctypes.c_int32]
        lib.palu_sched_request_state.restype = ctypes.c_int32
        lib.palu_sched_request_state.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.palu_sched_generated.restype = ctypes.c_int32
        lib.palu_sched_generated.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.palu_sched_num_queued.restype = ctypes.c_int32
        lib.palu_sched_num_queued.argtypes = [ctypes.c_void_p]
        lib.palu_sched_stats.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64)]
        self._lib = lib
        self._h = lib.palu_sched_create(num_lanes, s_max)
        self.num_lanes = num_lanes

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.palu_sched_destroy(self._h)
            self._h = None

    def add(self, rid: int, prompt_len: int, max_new_tokens: int) -> bool:
        return self._lib.palu_sched_add(self._h, rid, prompt_len, max_new_tokens) == 0

    def cancel(self, rid: int) -> bool:
        return self._lib.palu_sched_cancel(self._h, rid) == 0

    def admit(self):
        ids = (ctypes.c_int64 * self.num_lanes)()
        lanes = (ctypes.c_int32 * self.num_lanes)()
        n = self._lib.palu_sched_admit(self._h, ids, lanes, self.num_lanes)
        return [(int(ids[i]), int(lanes[i])) for i in range(n)]

    def active(self) -> List[int]:
        ids = (ctypes.c_int64 * self.num_lanes)()
        self._lib.palu_sched_active(self._h, ids)
        return [int(x) for x in ids]

    def on_token(self, lane: int, is_eos: bool) -> int:
        return self._lib.palu_sched_on_token(self._h, lane, 1 if is_eos else 0)

    def state(self, rid: int) -> int:
        return self._lib.palu_sched_request_state(self._h, rid)

    def generated(self, rid: int) -> int:
        return self._lib.palu_sched_generated(self._h, rid)

    def num_queued(self) -> int:
        return self._lib.palu_sched_num_queued(self._h)

    def stats(self):
        a, f, t = ctypes.c_int64(), ctypes.c_int64(), ctypes.c_int64()
        self._lib.palu_sched_stats(self._h, ctypes.byref(a), ctypes.byref(f),
                                   ctypes.byref(t))
        return {"admitted": a.value, "finished": f.value, "tokens": t.value}


class PyScheduler:
    """Pure-Python mirror of the native scheduler (fallback / differential
    testing oracle)."""

    def __init__(self, num_lanes: int, s_max: int):
        self.num_lanes = num_lanes
        self.s_max = s_max
        self.queue: List[int] = []
        self.lanes = [-1] * num_lanes
        self.requests: Dict[int, dict] = {}
        self._stats = {"admitted": 0, "finished": 0, "tokens": 0}

    def add(self, rid, prompt_len, max_new_tokens):
        if prompt_len >= self.s_max:
            return False
        room = self.s_max - prompt_len
        self.requests[rid] = {
            "prompt_len": prompt_len,
            "max_new": min(max_new_tokens, room),
            "generated": 0, "lane": -1, "state": 0,
        }
        self.queue.append(rid)
        self._stats["admitted"] += 1
        return True

    def cancel(self, rid):
        r = self.requests.get(rid)
        if r is None:
            return False
        if r["state"] == 1 and r["lane"] >= 0:
            self.lanes[r["lane"]] = -1
        r["state"] = 3
        return True

    def admit(self):
        out = []
        for lane in range(self.num_lanes):
            if self.lanes[lane] != -1:
                continue
            while self.queue:
                rid = self.queue.pop(0)
                r = self.requests.get(rid)
                if r is None or r["state"] != 0:
                    continue
                r["state"], r["lane"] = 1, lane
                self.lanes[lane] = rid
                out.append((rid, lane))
                break
        return out

    def active(self):
        return list(self.lanes)

    def on_token(self, lane, is_eos):
        rid = self.lanes[lane]
        if rid == -1:
            return -1
        r = self.requests[rid]
        r["generated"] += 1
        self._stats["tokens"] += 1
        if is_eos or r["generated"] >= r["max_new"]:
            r["state"], r["lane"] = 2, -1
            self.lanes[lane] = -1
            self._stats["finished"] += 1
            return 1
        return 0

    def state(self, rid):
        r = self.requests.get(rid)
        return -1 if r is None else r["state"]

    def generated(self, rid):
        r = self.requests.get(rid)
        return -1 if r is None else r["generated"]

    def num_queued(self):
        return sum(1 for rid in self.queue if self.requests[rid]["state"] == 0)

    def stats(self):
        return dict(self._stats)


def load_scheduler(num_lanes: int, s_max: int, prefer_native: bool = True):
    if prefer_native:
        try:
            return NativeScheduler(num_lanes, s_max)
        except Exception:
            pass
    return PyScheduler(num_lanes, s_max)


class ServingEngine:
    """Continuous batching over a lane-batched Engine.

    With `ecfg.mesh` set, the engine runs sharded: params tensor-parallel
    over the `model` axis, the lane-batched latent cache over
    (data, model), and the decode step dispatches through the shard_map'd
    Pallas kernel when `ecfg.use_pallas`. Each host admits requests only
    into the lanes whose data-axis shard it owns
    (multihost.host_local_batch_slice), so continuous-batching traffic rides
    the data axis; lockstep multi-host stepping drives the same jitted
    program on every process.
    """

    def __init__(self, params, cfg, ecfg: EngineConfig, prefer_native: bool = True,
                 prefill_chunks_per_step: Optional[int] = None):
        """prefill_chunks_per_step: None = prefill whole prompts at admission
        (lowest per-request latency when the queue is empty); an int K =
        interleave at most K prefill chunks per decode step, so admitting a
        long prompt never stalls the running lanes' token cadence (chunked
        prefill, the continuous-batching norm)."""
        assert ecfg.batch >= 1
        self.prefill_chunks_per_step = prefill_chunks_per_step
        self._inflight: Dict[int, Dict] = {}  # rid -> partial-prefill state
        self.engine = Engine(params, cfg, ecfg)
        if ecfg.mesh is not None:
            from ..parallel import mesh as mesh_lib

            self.engine.params = mesh_lib.shard_tree(
                self.engine.params,
                mesh_lib.param_shardings(self.engine.params, ecfg.mesh),
            )
        # batch-1 engine sharing (possibly sharded) params, for per-request
        # prefill; its own decode path is unused so it takes no mesh
        self.prefill_engine = Engine(
            self.engine.params, self.engine.cfg,
            dataclasses.replace(ecfg, batch=1, mesh=None),
        )
        if ecfg.mesh is not None:
            from ..parallel import multihost

            self.local_lanes = multihost.host_local_batch_slice(
                ecfg.batch, ecfg.mesh
            )
        else:
            self.local_lanes = slice(0, ecfg.batch)
        n_local = self.local_lanes.stop - self.local_lanes.start
        self.sched = load_scheduler(n_local, ecfg.s_max, prefer_native)
        self.cache = self.engine.init_cache()
        if ecfg.mesh is not None:
            from ..parallel import mesh as mesh_lib

            self.cache = mesh_lib.shard_tree(
                self.cache, mesh_lib.cache_shardings(self.cache, ecfg.mesh)
            )
        self.tokens = np.zeros((ecfg.batch, 1), np.int32)  # next input per lane
        self.outputs: Dict[int, List[int]] = {}
        self._insert = jax.jit(self._insert_impl, donate_argnums=(0,),
                               static_argnames=("lane",))
        self.eos_token_id: Optional[int] = None

    @staticmethod
    def _insert_impl(batched_cache, single_cache, lane: int):
        new_layers = []
        for b_entry, s_entry in zip(batched_cache["layers"], single_cache["layers"]):
            new_entry = {}
            for side in b_entry:
                new_entry[side] = {
                    k: jax.lax.dynamic_update_slice(
                        b_entry[side][k], s_entry[side][k], (lane, 0, 0, 0)
                    )
                    for k in b_entry[side]
                }
            new_layers.append(new_entry)
        length = batched_cache["length"].at[lane].set(single_cache["length"][0])
        return {"layers": new_layers, "length": length}

    def submit(self, rid: int, prompt_ids: np.ndarray, max_new_tokens: int) -> bool:
        prompt_ids = np.asarray(prompt_ids).reshape(1, -1)
        ok = self.sched.add(rid, prompt_ids.shape[1], max_new_tokens)
        if ok:
            self.outputs[rid] = []
            if not hasattr(self, "_prompts"):
                self._prompts = {}
            self._prompts[rid] = prompt_ids
        return ok

    def step(self) -> int:
        """Admit + prefill new requests, run one decode step for all lanes.
        Returns the number of active (host-local) lanes stepped. Scheduler
        lanes are host-local; global lane = local + local_lanes.start."""
        base = self.local_lanes.start
        # admission
        for rid, lane in self.sched.admit():
            prompt = self._prompts.pop(rid)
            if self.prefill_chunks_per_step is not None:
                self._inflight[rid] = {
                    "lane": lane, "off": 0, "prompt": prompt, "logits": None,
                    "cache": self.prefill_engine.init_cache(),
                }
                continue
            logits, single_cache = self.prefill_engine.prefill_auto(prompt)
            first_tok = int(np.asarray(jnp.argmax(logits[0, -1])))
            self.cache = self._insert(self.cache, single_cache, lane=base + lane)
            self.tokens[base + lane, 0] = first_tok
            self.outputs[rid].append(first_tok)
            done = self.sched.on_token(lane, self._is_eos(first_tok))
            if done:
                continue

        self._advance_prefills(base)

        active = self.sched.active()
        n_active = sum(1 for a in active if a != -1)
        if n_active == 0:
            return 1 if self._inflight else 0

        # idle lanes decode too (static shapes) but the active mask freezes
        # their length and makes their cache writes no-ops on device.
        # Lanes still mid-prefill (inflight) are masked out: their lane cache
        # is not inserted yet and they have no token to feed.
        mask = np.zeros((self.engine.ecfg.batch,), np.bool_)
        mask[base : base + len(active)] = [
            a != -1 and a not in self._inflight for a in active
        ]
        logits, self.cache = self.engine.decode(self.tokens, self.cache, active=mask)
        next_toks = np.asarray(jnp.argmax(logits[:, -1], axis=-1))
        for lane, rid in enumerate(active):
            if rid == -1 or rid in self._inflight:
                continue
            tok = int(next_toks[base + lane])
            self.outputs[rid].append(tok)
            self.tokens[base + lane, 0] = tok
            self.sched.on_token(lane, self._is_eos(tok))
        return n_active

    def _advance_prefills(self, base: int) -> None:
        """Advance each in-flight chunked prefill by up to
        prefill_chunks_per_step chunks; insert completed prompts into their
        lane and emit the first token."""
        if not self._inflight:
            return
        chunk = self.prefill_engine._chunk
        for rid in list(self._inflight):
            st = self._inflight[rid]
            total = st["prompt"].shape[1]
            for _ in range(self.prefill_chunks_per_step):
                end = min(st["off"] + chunk, total)
                ids = st["prompt"][:, st["off"] : end]
                if end - st["off"] < chunk:
                    ids = np.pad(ids, ((0, 0), (0, chunk - (end - st["off"]))))
                st["logits"], st["cache"] = self.prefill_engine.prefill_chunk(
                    ids, st["cache"], st["off"]
                )
                st["off"] = end
                if end >= total:
                    break
            if st["off"] < total:
                continue
            last = self.prefill_engine._last_gather_jit(
                st["logits"], jnp.full((1,), (total - 1) % chunk, jnp.int32)
            )
            sc = dict(st["cache"])
            sc["length"] = jnp.full((1,), total, jnp.int32)
            first_tok = int(np.asarray(jnp.argmax(last[0, -1])))
            lane = st["lane"]
            self.cache = self._insert(self.cache, sc, lane=base + lane)
            self.tokens[base + lane, 0] = first_tok
            self.outputs[rid].append(first_tok)
            self.sched.on_token(lane, self._is_eos(first_tok))
            del self._inflight[rid]

    def _is_eos(self, tok: int) -> bool:
        return self.eos_token_id is not None and tok == self.eos_token_id

    def run_until_done(self, max_steps: int = 100000) -> Dict[int, List[int]]:
        steps = 0
        while (self.sched.num_queued() > 0 or any(
            a != -1 for a in self.sched.active()
        )) and steps < max_steps:
            self.step()
            steps += 1
        return self.outputs

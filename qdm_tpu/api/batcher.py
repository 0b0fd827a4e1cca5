"""Continuous batching on top of the DecodeEngine.

The reference serves fixed batches (its fused stack decodes one batch
to completion, models/base.py:1494-1515); production serving wants
*continuous* batching: when one request finishes, a queued request is
admitted into its batch row while the other rows keep decoding
(vLLM-style scheduling, here without paged memory: the admitted
prompt's K/V is right-aligned to the shared physical append position
and everything before it is masked by the engine's per-row starts).

Design (TPU-first):

* The decode step stays ONE jitted scan over fixed (batch, cache)
  shapes — no recompilation at admission time.  Scheduling runs on the
  host between fixed-size chunks; the only device work per admission
  is a single-row ragged prefill plus a masked scatter into the live
  caches (``DecodeEngine.admit_row``).
* Physical cache slots are append-only and shared across rows (the
  engine kernels write each new token at one scalar position), so an
  admitted prompt of length L occupies slots [p - L, p) where p is the
  current append position: the evicted request's dead K/V is simply
  overwritten/masked.  When the shared append slot nears capacity the
  scheduler REBASES: every live window shifts left by the common dead
  prefix (one jitted roll per layer, fixed shapes), so a BOUNDED cache
  serves unbounded request streams (bit-exact, tested).
* Greedy decode (the exactness contract below); per-row logical rope
  positions and attention-start masks come from the ragged serving
  machinery, so every request's tokens are IDENTICAL to a
  single-prompt ``DecodeEngine.generate`` of that request (tested, f32
  CPU bit-exact, including channel-static int8 KV).
"""

from __future__ import annotations

import time
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class ContinuousBatcher:
    """Host-side continuous-batching scheduler over a DecodeEngine.

    eng: a single-device DecodeEngine (any weight mode; int8/int4 KV in
    channel-static scale mode).  max_batch rows decode together in
    fixed-size chunks; finished rows are refilled from the queue
    between chunks."""

    def __init__(self, engine, max_batch: int = 4, chunk: int = 8,
                 capacity: int = 1024, admit_chunk: int = 0,
                 admit_batch: int = 0, admit_min_free: int = 1):
        if engine.spmd:
            raise NotImplementedError("continuous batching is single-device")
        self.eng = engine
        self.max_batch = int(max_batch)
        self.chunk = int(chunk)
        self.capacity = int(capacity)
        # admit_chunk > 0 INTERLEAVES admissions with decode: the
        # admission mini-prefill runs in admit_chunk-token slices, one
        # slice per decode chunk, so running requests never stall
        # longer than one slice (a full mini-prefill between decode
        # chunks is the measured max_stall_s source).  0 = admit in
        # one shot (lowest total admission cost, biggest stall).
        self.admit_chunk = int(admit_chunk)
        # admit_batch > 0 caps the admission mini-prefill at that many
        # ROWS (one fixed jit shape, like the full-width one): the
        # fixed (max_batch, width) mini-prefill does max_batch rows of
        # work however few rows are admitted — on variable-budget
        # streams (rows retiring 1-2 at a time) that made admission
        # work dominate the stream (r5 --stream spread leg).
        # admit_min_free defers admission until that many rows are
        # free (or no bigger wave can ever form), so small waves
        # coalesce; TTFT trades against throughput.
        self.admit_batch = int(admit_batch)
        self.admit_min_free = max(1, int(admit_min_free))
        self.last_stats = None       # per-request latency metrics (run())

    def run(self, prompts: Sequence[np.ndarray], max_new_tokens=32,
            eos_token_id: Optional[int] = None,
            temperature: float = 0.0, top_k: int = 0, top_p: float = 0.0,
            per_request_seeds: Optional[Sequence[int]] = None,
            seed: int = 0, prefix=None) -> List[np.ndarray]:
        """Serve every prompt; returns prompt+generated per request, in
        request order.  A request finishes on EOS (if given) or after
        its token budget; its row is immediately refilled from the
        queue.  max_new_tokens: one global budget or a per-request
        sequence (variable completion lengths are where continuous
        batching beats static batches — a static batch decodes every
        row to its longest member's budget).

        temperature > 0 samples (top_k / top_p as in generate_ragged)
        with PER-REQUEST keys: request i draws from
        PRNGKey(per_request_seeds[i]) (default seed + i) folding its
        own step counter, so its sampled completion is IDENTICAL to a
        single-prompt generate_ragged([prompt], per_row_seeds=[s])
        whatever batch composition it decoded in (tested).

        prefix: a shared system-prompt token array (or a
        ``DecodeEngine.precompute_prefix`` handle) every request sits
        on top of; ``prompts`` are then the per-request SUFFIXES, and
        each returned array is suffix+generated.  The prefix forward
        runs ONCE for the whole stream — admissions paste its KV and
        prefill only the suffix (greedy rows stay bit-identical to a
        single-prompt generate of [prefix|suffix], tested).

        After a run, ``self.last_stats`` holds per-request latency
        metrics (host-clock): ``ttft`` (time to each request's FIRST
        generated token — produced by its admission prefill),
        ``done`` (request completion time), ``p50_ttft``/``p95_ttft``,
        ``max_stall_s`` (the longest gap between consecutive decode
        chunks any running request experienced — admission prefills
        between chunks are the main contributor), and ``wall_s``."""
        eng = self.eng
        t_run0 = time.time()
        ttft = [None] * len(prompts)
        done = [None] * len(prompts)
        stalls = []
        n_rebases = 0
        prompts = [np.asarray(p).reshape(-1).astype(np.int32)
                   for p in prompts]
        pc = None
        if prefix is not None:
            pc = (prefix if (isinstance(prefix, tuple) and len(prefix) == 2)
                  else eng.precompute_prefix(np.asarray(prefix)))
        p0 = pc[0] if pc is not None else 0
        assert all(len(p) > 0 for p in prompts)
        if np.ndim(max_new_tokens) == 0:
            budgets = [int(max_new_tokens)] * len(prompts)
        else:
            budgets = [int(m) for m in max_new_tokens]
            assert len(budgets) == len(prompts)
        assert all(m >= 1 for m in budgets)
        if temperature <= 0.0 and (top_k or top_p):
            raise ValueError("top_k/top_p need temperature > 0")
        sampler = ((float(temperature), int(top_k), float(top_p))
                   if temperature > 0.0 else ())
        if per_request_seeds is None:
            per_request_seeds = [seed + i for i in range(len(prompts))]
        assert len(per_request_seeds) == len(prompts)
        req_keys = [np.asarray(jax.random.PRNGKey(np.uint32(s)))
                    for s in per_request_seeds] if sampler else None
        queue = list(range(len(prompts)))
        n_rows = min(self.max_batch, len(prompts))
        m_adm = min(self.admit_batch, n_rows) if self.admit_batch \
            else n_rows

        # ---- initial fill.  Without a prefix: one ragged prefill over
        # the first batch (capacity-length caches), padded to the
        # run-wide 128-aligned prompt width (one jit shape for the
        # whole run; also the width admissions use).  With a prefix:
        # start from EMPTY caches and admit the first batch through
        # the same prefixed-admission path every later refill uses
        # (one code path, one jit shape).
        s_sfx = -(-max(len(pr) for pr in prompts) // 128) * 128
        s0 = -(-(p0 + max(len(pr) for pr in prompts)) // 128) * 128
        fully_windowed = bool(eng.window) and all(
            w is not None for w in eng._layer_windows)
        if fully_windowed:
            # rebasing + the per-chunk start floor bound every live
            # row's span at O(window): capacity only has to hold the
            # window (or one admission width) plus one decode chunk,
            # regardless of the generation budgets — this is what lets
            # a bounded cache serve unbounded windowed streams.
            need = max(s0, eng.window, s_sfx) + self.chunk
            assert need <= self.capacity, (
                f"capacity too small: windowed serving needs "
                f"max(prefill {s0}, window {eng.window}, admission "
                f"{s_sfx}) + chunk {self.chunk} = {need}")
        else:
            assert s0 + max(budgets) <= self.capacity, "capacity too small"
        out: dict = {}
        if pc is None:
            first, queue = queue[:n_rows], queue[n_rows:]
            lens0 = np.asarray([len(prompts[i]) for i in first], np.int32)
            ids = np.zeros((n_rows, s0), np.int32)
            for r, i in enumerate(first):
                ids[r, s0 - len(prompts[i]):] = prompts[i]
            tok0, caches, starts = eng.prefill_ragged(ids, lens0,
                                                      self.capacity)
            if sampler:
                from qdm_tpu.api.causal_lm import fold_key

                keys0 = jnp.asarray(np.stack([req_keys[i] for i in first]))
                tok0 = eng._pick0(sampler)(eng._last_prefill_logits,
                                           fold_key(keys0, 2 ** 32 - 1))
            eng._last_prefill_logits = None

            p = s0                                     # shared append slot
            cur = np.array(np.asarray(tok0), np.int32)  # last token/row
            lens = lens0.astype(np.int64).copy()   # next logical rope pos
            starts = np.asarray(starts, np.int32).copy()
            req = list(first)                          # row -> request id
            gen = [[int(cur[r])] for r in range(n_rows)]
            offs = np.zeros(n_rows, np.int32)      # per-row folds consumed
            active = [True] * n_rows
            now = time.time() - t_run0
            for i in first:
                ttft[i] = now
        else:
            caches = eng.init_cache(n_rows, self.capacity)
            p = s0
            cur = np.zeros(n_rows, np.int32)
            lens = np.zeros(n_rows, np.int64)
            starts = np.full(n_rows, s0, np.int32)
            req = [-1] * n_rows
            gen = [[] for _ in range(n_rows)]
            offs = np.zeros(n_rows, np.int32)
            active = [False] * n_rows

        def finished(r) -> bool:
            g = gen[r]
            return len(g) >= budgets[req[r]] or (
                eos_token_id is not None and g[-1] == eos_token_id)

        def retire(r):
            g = gen[r]
            if eos_token_id is not None and eos_token_id in g:
                g = g[: g.index(eos_token_id) + 1]
            out[req[r]] = np.concatenate(
                [prompts[req[r]], np.asarray(g, np.int32)])
            done[req[r]] = time.time() - t_run0
            active[r] = False

        # fixed admission shapes: every admission round pads to the
        # full row count and to one prompt width, so the mini-prefill
        # and scatter jit ONCE per run — per-(m, width) retraces were
        # remote compiles inside the serving loop on the tunnel
        # (measured: they inverted the continuous-vs-static result)
        s_adm = s_sfx if pc is not None else s0
        dummy = np.zeros(1, np.int32)
        dummy_key = req_keys[0] if sampler else None
        job = {}                       # in-flight chunked admission

        def take_admissible():
            free = [r for r in range(n_rows) if not active[r]]
            take = []
            while queue and len(take) < min(len(free), m_adm) \
                    and p0 + len(prompts[queue[0]]) <= p:
                take.append(queue.pop(0))   # arrival order; a too-long
                # head prompt blocks until p grows (no reordering)
            return free, take

        def defer(free, take):
            """Coalesce small admission waves (admit_min_free): put
            the taken requests back and wait for more rows to retire —
            unless no bigger wave can ever form (queue exhausted or
            nothing left decoding)."""
            if (len(take) and len(take) < self.admit_min_free
                    and len(take) < m_adm and queue and any(active)):
                queue[:0] = take
                return True
            return False

        def start_admission():
            """Begin a chunked admission job over all currently
            admissible requests (interleaved mode): the mini-prefill
            advances one admit_chunk slice per decode chunk."""
            free, take = take_admissible()
            if not take or defer(free, take):
                return
            rows_ = free[: len(take)] + [-1] * (m_adm - len(take))
            lens_ = np.asarray(
                [len(prompts[i]) for i in take]
                + [1] * (m_adm - len(take)), np.int32)
            ids = np.zeros((m_adm, s_adm), np.int32)
            for j, i in enumerate(take):
                ids[j, s_adm - len(prompts[i]):] = prompts[i]
            cfg = eng.cfg
            mini = [(jnp.zeros((m_adm, 2 * cfg.num_key_value_heads,
                                cfg.head_dim, p0 + s_adm), eng.dtype),)
                    for _ in range(cfg.num_hidden_layers)]
            job.update(rows=rows_, take=take, ids=ids,
                       pads=jnp.asarray(s_adm - lens_), lens=lens_,
                       ci=0, mini=mini, logits=None)

        def step_admission():
            """Advance the in-flight admission by one slice; admit the
            rows when the mini-prefill completes."""
            nonlocal caches
            c = self.admit_chunk
            ids_c = job["ids"][:, job["ci"]: job["ci"] + c]
            logits, job["mini"] = eng.admission_chunk_step(
                job["mini"], ids_c, job["pads"], job["ci"], p0,
                kvpre=pc[1] if pc is not None else None)
            job["ci"] += c
            if job["ci"] < s_adm:
                job["logits"] = logits
                return
            mini_eng = eng.admission_finalize(job["mini"], job["pads"],
                                              s_adm, p0)
            caches = eng.admit_scatter(caches, mini_eng, job["rows"], p,
                                       job["lens"], p0)
            if sampler:
                from qdm_tpu.api.causal_lm import fold_key

                keys_ = jnp.asarray(np.stack(
                    [req_keys[i] for i in job["take"]]
                    + [dummy_key] * (m_adm - len(job["take"]))))
                toks = eng._pick0(sampler)(logits,
                                           fold_key(keys_, 2 ** 32 - 1))
            else:
                toks = jnp.argmax(logits, axis=-1)
            toks = np.asarray(toks, np.int32)
            now = time.time() - t_run0
            for j, (r, i) in enumerate(zip(job["rows"], job["take"])):
                ln = int(job["lens"][j])
                req[r], gen[r], active[r] = i, [int(toks[j])], True
                cur[r], lens[r] = toks[j], p0 + ln
                starts[r], offs[r] = p - p0 - ln, 0
                ttft[i] = now
            job.clear()

        def admit_free_rows():
            """Refill ALL free rows that have admissible requests with
            one batched mini-prefill + scatter (per-admission device
            round-trips were the measured cost on the tunnel).  In
            interleaved mode (admit_chunk > 0) this instead advances /
            starts the chunked admission job."""
            nonlocal caches, queue
            if self.admit_chunk:
                if job:
                    step_admission()
                if not job:
                    start_admission()
                return
            free, take = take_admissible()
            if not take or defer(free, take):
                return
            rows_ = free[: len(take)] + [-1] * (m_adm - len(take))
            pr_ = [prompts[i] for i in take] \
                + [dummy] * (m_adm - len(take))
            keys_ = ([req_keys[i] for i in take]
                     + [dummy_key] * (m_adm - len(take))) \
                if sampler else None
            toks, caches, sts, lns = eng.admit_rows(
                caches, rows_, pr_, p, sampler=sampler, keys=keys_,
                pad_s=s_adm, prefix=pc)
            now = time.time() - t_run0
            for r, i, t0, st, ln in zip(rows_, take, toks, sts, lns):
                req[r], gen[r], active[r] = i, [int(t0)], True
                cur[r], lens[r], starts[r], offs[r] = t0, ln, st, 0
                ttft[i] = now

        for r in range(n_rows):
            if active[r] and finished(r):
                retire(r)
        admit_free_rows()

        run = eng._make_run_ragged_chunk(self.chunk, sampler)
        last_chunk_t = time.time()
        while any(active) or queue or job:
            if not any(active):
                if self.admit_chunk:
                    # nothing decoding: drive the admission forward
                    # without burning no-op decode chunks
                    if not job:
                        start_admission()
                    if job:
                        step_admission()
                        continue
                # only over-long queued prompts remain: they need more
                # physical room than p provides — advance p with a
                # no-op chunk (rows are all retired; outputs ignored)
            if p + self.chunk > self.capacity:
                # rebase: every row's dead prefix (below its attention
                # start) is reclaimable — shift all live windows left
                # by the common dead width and keep serving in the
                # bounded cache (unbounded request streams)
                delta = min((int(starts[r]) for r in range(n_rows)
                             if active[r]), default=p)
                assert delta > 0, \
                    "cache capacity exceeded — live rows fill the " \
                    "cache; raise `capacity`"
                caches = eng.rebase_caches(caches, delta)
                p -= delta
                starts = np.maximum(starts - delta, 0)
                n_rebases += 1
            kw = {}
            if sampler:
                kw = {"offs": jnp.asarray(offs),
                      "key": jnp.asarray(np.stack(
                          [req_keys[req[r]] for r in range(n_rows)]))}
            toks, last, caches = run(
                eng.layers, eng.embed, eng.final_norm, eng._head,
                jnp.asarray(cur), caches, jnp.int32(p),
                jnp.asarray(lens, jnp.int32), jnp.asarray(starts), **kw)
            toks = np.asarray(toks, np.int32)
            if any(active):
                stalls.append(time.time() - last_chunk_t)
            last_chunk_t = time.time()
            cur = np.asarray(last, np.int32).copy()
            p += self.chunk
            lens += self.chunk
            offs += self.chunk
            if fully_windowed:
                # sliding-window serving (ALL layers windowed —
                # mistral-class): every slot below p - W + 1 is outside
                # every row's window (the engine floors its attention
                # starts per step already) — advance the host starts
                # too so the rebase above reclaims the dead pre-window
                # tail and the bounded cache serves unbounded streams
                # at O(window) memory per row.  Models with GLOBAL
                # layers (gemma2/3 alternation) must keep raw starts:
                # their global layers attend the whole history, so only
                # retired-row space is reclaimable.
                starts = np.maximum(
                    starts, max(p - eng.window + 1, 0)).astype(np.int32)
            for r in range(n_rows):
                if not active[r]:
                    continue
                for t in toks[r]:
                    if finished(r):
                        break
                    gen[r].append(int(t))
                if finished(r):
                    retire(r)
            admit_free_rows()
        tt = np.asarray([t for t in ttft if t is not None])
        self.last_stats = {
            "ttft": ttft, "done": done,
            "p50_ttft": float(np.percentile(tt, 50)) if tt.size else None,
            "p95_ttft": float(np.percentile(tt, 95)) if tt.size else None,
            "max_stall_s": float(max(stalls)) if stalls else None,
            "p95_stall_s": (float(np.percentile(np.asarray(stalls), 95))
                            if stalls else None),
            "wall_s": time.time() - t_run0,
            "rebases": n_rebases,
        }
        return [out[i] for i in range(len(prompts))]

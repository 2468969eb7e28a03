"""Benchmark: end-to-end training throughput of the headline pipeline.

Measures steady-state memes/sec of ``vilbert_lmdb_train`` on one chip at the
0.7580-AUROC configuration (Facebook-exact ViLBERT, batch 16, 128 text
tokens, 100×2048 regions — reference conf/base/parameters.yml:570-610).

Input path: the TPU-native **device-resident dataset** (data/device_cache.py)
— LMDB features are decoded once on the host, uploaded to HBM in bf16, and
each step gathers its batch by index inside the compiled program. Steady
state sends only 16 int32 indices per step across the host link. (The
prefetching host loader is the fallback for datasets that exceed HBM;
`docs/ARCHITECTURE.md` discusses the trade-off.)

Cold-start design (round 3): the round-2 driver run was lost to a timeout
(BENCH_r02.json rc=124) because the /tmp compile cache was cold and the
fixture rebuilt from scratch. Now:
  * the XLA compilation cache lives in the repo at
    ``data/09_bench_cache/jax_cache`` and its entries are COMMITTED (~120 MB
    — the K-step train program serializes to ~80 MB), so a fresh checkout
    warm-starts the 3-8 min remote compile. EVERY program is persisted
    (min_compile_time 0): relay compile latency varies 1 s → 185 s for the
    same op, so even "trivial" uncached programs can stall a budgeted run;
  * the fixture is half the size (256 examples — 50 measured steps at batch
    16 revisit examples either way) and is rebuilt in ~15 s if missing;
  * the run is budgeted: a parent process runs the headline measurement in a
    child with a deadline (BENCH_BUDGET, default 540 s); if the child cannot
    finish in time (e.g. cache invalidated by a code change AND a slow relay)
    the parent falls back to the scan-over-layers stacked encoder
    (config.stacked_encoder), which compiles ONE superlayer instead of 24
    inlined blocks — slower per step (measured 516 memes/s vs 728) but it
    banks a real number instead of nothing.

Baseline: the reference publishes NO throughput numbers (BASELINE.md) — its
metrics are quality-only. ``vs_baseline`` is computed against a documented
engineering estimate of the PyTorch reference on its stated hardware:
the reference trains eager fp32 with NO AMP (SURVEY.md §2.7) on a "CUDA GPU,
8GB+ VRAM / 16GB recommended" (README.md:28) — a T4/V100-class card. ViLBERT
at this config costs ~150 GFLOP/meme fwd+bwd; V100 fp32 peak is 15.7 TFLOPs,
eager-mode utilisation ~40% → ~6 TFLOPs → ~40 memes/s compute-bound, further
throttled by the synchronous num_workers=0 per-item input path. We use
100 memes/s as the baseline — i.e. ~2.5× more generous to the reference than
the V100-fp32 arithmetic suggests — so vs_baseline is conservative.

Prints ONE final JSON line: {"metric", "value", "unit", "vs_baseline"[,
"extras"]} — the train metric stays last; the serving record rides in
"extras" so the driver artifact captures both axes.
"""

from __future__ import annotations

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
# persistent XLA compilation cache: COMMITTED to the repo so the driver's
# cold run skips the 3-8 min remote compile (entries are ~1 MB)
_CACHE_DIR = os.environ.get(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(_HERE, "data", "09_bench_cache", "jax_cache"),
)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE_DIR)
# persist EVERY program: relay compile latency is wildly variable
# (measured 1 s to 185 s for the SAME trivial op depending on relay
# load) — a small program that compiled "fast" once and was skipped
# by the default 2 s threshold can stall a later cold run for minutes
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np

REFERENCE_MEMES_PER_SEC_ESTIMATE = 100.0
# headline config is batch 16 (the 0.7580-AUROC setting); BENCH_BATCH=32
# measures the reference's lmdb_b32 ablation config (quality −1.47 AUROC pts
# per its own tuning log, but higher throughput — reported for completeness)
BATCH_SIZE = int(os.environ.get("BENCH_BATCH", "16"))
SEQ_LEN = 128
NUM_REGIONS = 100
FEATURE_DIM = 2048
WARMUP_STEPS = 5
MEASURE_STEPS = 50
N_EXAMPLES = 256


def _configure_jax_cache():
    """Belt and braces: the axon sitecustomize imports jax at interpreter
    startup, which may latch config before our env vars — pin the cache dir
    through jax.config as well (safe to call before any compile)."""
    import jax

    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def _build_fixture(cache_dir: str) -> str:
    """Fabricated detectron.lmdb (100×2048 pickled features, real format)."""
    from multimodal_classification_tpu.data.lmdb_store import write_feature_lmdb

    path = os.path.join(cache_dir, f"bench_{N_EXAMPLES}x{NUM_REGIONS}.lmdb")
    if os.path.exists(path):
        return path
    os.makedirs(cache_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    ids = [str(10000 + i) for i in range(N_EXAMPLES)]
    feats = rng.standard_normal(
        (N_EXAMPLES, NUM_REGIONS, FEATURE_DIM), dtype=np.float32)
    boxes = rng.uniform(0, 1000, (N_EXAMPLES, NUM_REGIONS, 4)).astype(np.float32)
    write_feature_lmdb(path, ids, feats, boxes)
    return path


def _backend_watchdog(timeout_s: float):
    """Kill the process if the backend never comes up: a downed TPU relay
    HANGS backend init (no error), which would otherwise hang the driver.
    Returns a cancel() callable to invoke once devices are live."""
    import threading

    timer = threading.Timer(timeout_s, lambda: (
        print(f"bench: no backend within {timeout_s:.0f}s "
              "(TPU relay down?) — aborting", file=sys.stderr, flush=True),
        os._exit(3),
    ))
    timer.daemon = True
    timer.start()
    return timer.cancel


def setup(k: int = 10, stacked: bool | None = None, want_parts: bool = False):
    """Build the bench configuration: device-resident data, jitted K-step
    train step, initial state and the index-block iterator. Shared by the
    throughput measurement (main) and scripts/profile_step.py."""
    cancel_watchdog = _backend_watchdog(
        float(os.environ.get("BENCH_BACKEND_TIMEOUT", "420")))
    import jax
    import jax.numpy as jnp
    import optax
    import pandas as pd

    _configure_jax_cache()

    from multimodal_classification_tpu.config import facebook_vilbert_config
    from multimodal_classification_tpu.data import (
        MemesDataset,
        WordPieceTokenizer,
        build_test_vocab,
    )
    from multimodal_classification_tpu.data.device_cache import (
        build_device_data,
        epoch_indices,
        make_device_multi_step,
    )
    from multimodal_classification_tpu.data.lmdb_store import LMDBFeatureStore
    from multimodal_classification_tpu.models.vilbert import ViLBERTForClassification
    from multimodal_classification_tpu.training.losses import get_loss_function
    from multimodal_classification_tpu.training.schedule import warmup_linear_schedule
    from multimodal_classification_tpu.training.train import TrainState, model_inputs

    dev = jax.devices()[0]
    cancel_watchdog()
    print(f"benchmarking on {dev.platform}:{dev.device_kind}", file=sys.stderr,
          flush=True)

    # host side: LMDB decode + tokenisation (once)
    t0 = time.perf_counter()
    lmdb_path = _build_fixture(os.path.join(_HERE, "data", "09_bench_cache"))
    store = LMDBFeatureStore(lmdb_path)
    rng = np.random.default_rng(0)
    words = ["the", "meme", "is", "hateful", "not", "love", "hate", "people", "a", "this"]
    df = pd.DataFrame(
        {
            "id": [str(10000 + i) for i in range(N_EXAMPLES)],
            "text": [" ".join(rng.choice(words, 12)) for _ in range(N_EXAMPLES)],
            "label": rng.integers(0, 2, N_EXAMPLES),
        }
    )
    tok = WordPieceTokenizer(build_test_vocab())
    ds = MemesDataset(df, tok, store, max_seq_length=SEQ_LEN,
                      max_regions=NUM_REGIONS, feature_dim=FEATURE_DIM)
    print(f"host ingest: {time.perf_counter() - t0:.1f}s", file=sys.stderr,
          flush=True)

    # upload the tensorised dataset to HBM (bf16 wire dtype), once.
    # BENCH_FEATURE_DTYPE=int8 stores features int8 + per-(example,region)
    # scales (data/device_cache.py) — halves upload bytes + HBM residency;
    # the gather dequantises to bf16 on device (A/B arm "int8data")
    t0 = time.perf_counter()
    feat_dtype = (jnp.int8 if os.environ.get("BENCH_FEATURE_DTYPE") == "int8"
                  else jnp.bfloat16)
    data = build_device_data(ds, feature_dtype=feat_dtype)
    jax.block_until_ready(data.visual_features)
    print(f"device upload: {time.perf_counter() - t0:.1f}s "
          f"({data.visual_features.nbytes / 1e6:.0f} MB features, "
          f"{jnp.dtype(feat_dtype).name})",
          file=sys.stderr, flush=True)

    # BENCH_STACKED=1: scan-over-layers encoder (config.stacked_encoder) —
    # same math, params stacked [6, ...], one compiled superlayer loop.
    # ~40% slower per step but compiles ~6× less HLO: the budget fallback.
    if stacked is None:
        stacked = os.environ.get("BENCH_STACKED", "0") == "1"
    # BENCH_FFN_TRAIN / BENCH_ATTN_TRAIN: A/B overrides for the TRAINING
    # fused-kernel paths (default: the config defaults, i.e. whatever the
    # measured policy shipped) — used by scripts/bench_train_fused.py
    overrides = {}
    if os.environ.get("BENCH_FFN_TRAIN"):
        overrides["fused_ffn_training"] = os.environ["BENCH_FFN_TRAIN"] == "1"
    if os.environ.get("BENCH_ATTN_TRAIN"):
        overrides["fused_attn_block_training"] = (
            os.environ["BENCH_ATTN_TRAIN"] == "1")
    cfg = facebook_vilbert_config(stacked_encoder=stacked, **overrides)
    model = ViLBERTForClassification(cfg)
    loss_fn = get_loss_function("ce")
    schedule = warmup_linear_schedule(1e-5, 2000, 10_000)
    # bf16 first AND second moments (training/optimizers.py): measured
    # 34.4 vs 35.9 ms/step vs fp32-nu on v5e — the optimizer pass is
    # HBM-bound and moment traffic halves
    from multimodal_classification_tpu.training.optimizers import adamw_mixed

    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        adamw_mixed(schedule, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01,
                    mu_dtype=jnp.bfloat16, nu_dtype=jnp.bfloat16),
    )

    # text-length bucket: meme texts are ~12-25 tokens; attention over padded
    # keys is masked, so slicing to the real max length computes the SAME
    # function as the reference's always-128 padding, minus the padding FLOPs.
    # Host-computed (DeviceData.max_text_len): a device max-reduce here was
    # the single flakiest load on the bench critical path — round-4
    # rehearsals stalled >300 s at exactly this trivial op in FOUR stage
    # attempts while bigger programs loaded fine minutes later
    bucket = data.seq_bucket(32)
    print(f"text bucket: {bucket} of {SEQ_LEN} tokens (host-computed)",
          file=sys.stderr, flush=True)

    first = {k: np.stack([ds.get(i)[k] for i in range(2)]) for k in ds.get(0)}
    first = {**first, "input_ids": first["input_ids"][:, :bucket],
             "attention_mask": first["attention_mask"][:, :bucket],
             "token_type_ids": first["token_type_ids"][:, :bucket]}
    print("initializing params on device...", file=sys.stderr, flush=True)
    stop_beat = _heartbeat("params init")
    try:
        params = model.init(jax.random.key(0), **model_inputs(first))["params"]
    finally:
        stop_beat()
    print("params initialized", file=sys.stderr, flush=True)
    # BENCH_SLAB: flat-slab params/optimizer (training/flat_slab.py) —
    # "1" slabs leaves ≤64 KB (biases/LN + their moments → a handful of
    # contiguous buffers), "all" slabs every leaf including matmul weights
    # (REFUTED on v5e: 30 GB pathological tile layout — PERFORMANCE.md).
    # Default ON for the headline (round-5 A/B: slab won every rep pair —
    # 21.34/21.46/21.50 vs 21.52/21.58/22.16 ms/step, loss identical);
    # the stacked budget-fallback keeps the per-leaf program its committed
    # compile cache was built for.
    slab_mode = os.environ.get("BENCH_SLAB", "0" if stacked else "1")
    slab_spec = None
    if slab_mode not in ("0", ""):
        from multimodal_classification_tpu.training.flat_slab import (
            plan_slabs, slab_pack)

        slab_spec = plan_slabs(params,
                               threshold_bytes=-1 if slab_mode == "all" else 65536)
        params = slab_pack(params, slab_spec)
        print(f"flat-slab params: mode={slab_mode}, "
              f"{len(slab_spec.small)} leaves slabbed, "
              f"{len(slab_spec.large_positions)} kept", file=sys.stderr, flush=True)
    state = TrainState(jnp.zeros((), jnp.int32), params, tx.init(params))
    # K steps per dispatch: lax.scan over an index matrix (amortises host
    # dispatch latency; the whole epoch is one compiled call)
    K = k
    # grads dtype: env-overridable for A/B measurement (bf16 measured SLOWER
    # here — see CLAUDE.md perf dead ends; the cast doesn't fuse into bwd)
    grads_dtype = os.environ.get("BENCH_GRADS_DTYPE", "float32")
    unroll = int(os.environ.get("BENCH_UNROLL", "1"))
    pack_carry = os.environ.get("BENCH_PACK", "0") == "1"
    from multimodal_classification_tpu.utils.xla_options import (
        compiler_options_from_env)

    step = jax.jit(make_device_multi_step(model, loss_fn, tx, seq_bucket=bucket,
                                          grads_dtype=grads_dtype, unroll=unroll,
                                          pack_carry=pack_carry,
                                          slab_spec=slab_spec),
                   donate_argnums=0,
                   compiler_options=compiler_options_from_env())
    rng_key = jax.random.key(1, impl="rbg")

    def index_blocks():
        e = 0
        while True:
            block = []
            for idx in epoch_indices(N_EXAMPLES, BATCH_SIZE, e, seed=0):
                block.append(idx)
                if len(block) == K:
                    yield jnp.asarray(np.stack(block))
                    block = []
            e += 1

    if want_parts:
        return step, state, data, index_blocks(), rng_key, K, {
            "model": model, "loss_fn": loss_fn, "tx": tx, "ds": ds,
            "bucket": bucket, "params": params,
        }
    return step, state, data, index_blocks(), rng_key, K


def _heartbeat(label: str):
    """Background thread printing a progress line every 60 s while a long
    BLOCKING jax call (compile / executable load) is in flight. The parent's
    stall detector treats any output as liveness, so a genuinely-loading
    program gets the stage's full timeout instead of being stall-killed at
    BENCH_STALL seconds of silence — round-4 rehearsals measured the SAME
    warm train program loading in 33 s, 159 s, and >300 s depending on the
    relay's mood, and killing the slow loads never made the retry faster.
    Returns a stop callable."""
    import threading

    stop = threading.Event()
    t0 = time.monotonic()

    def beat():
        while not stop.wait(60):
            print(f"{label} in flight ({time.monotonic() - t0:.0f}s)...",
                  file=sys.stderr, flush=True)

    threading.Thread(target=beat, daemon=True).start()
    return stop.set


def _measure_train(stacked: bool) -> dict:
    step, state, data, it, rng_key, K = setup(stacked=stacked)
    t_c0 = time.perf_counter()
    stop_beat = _heartbeat("compile+warmup")
    try:
        for _ in range(max(WARMUP_STEPS // K, 1)):
            state, m = step(state, data, next(it), rng_key)
        # fetch the VALUE (device→host): on remote/tunneled backends
        # block_until_ready can return before compute completes
        _ = float(m["loss"])
    finally:
        stop_beat()
    print(f"compile+warmup: {time.perf_counter() - t_c0:.1f}s",
          file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    for _ in range(MEASURE_STEPS // K):
        state, m = step(state, data, next(it), rng_key)
    final_loss = float(m["loss"])
    dt = time.perf_counter() - t0

    memes_per_sec = MEASURE_STEPS * BATCH_SIZE / dt
    print(
        f"{MEASURE_STEPS} steps x batch {BATCH_SIZE} in {dt:.2f}s "
        f"({dt / MEASURE_STEPS * 1000:.1f} ms/step), loss={final_loss:.4f}",
        file=sys.stderr, flush=True,
    )
    suffix = ", scan-over-layers stacked encoder (budget fallback)" if stacked else ""
    # train MFU accounting (utils/flops.py — analytic matmul count, XLA
    # cross-checked in tests/test_flops.py): reported against the nominal
    # bf16 peak AND the chip's measured lone-dot ceiling (124 TFLOP/s)
    from multimodal_classification_tpu.config import facebook_vilbert_config
    from multimodal_classification_tpu.utils.flops import train_mfu

    mfu = train_mfu(facebook_vilbert_config(), memes_per_sec, BATCH_SIZE,
                    data.seq_bucket(32), NUM_REGIONS)
    print(f"train MFU: {mfu['train_tflops']} TFLOP/s = "
          f"{mfu['train_mfu_vs_nominal']:.1%} of nominal bf16 peak, "
          f"{mfu['train_mfu_vs_measured_ceiling']:.1%} of the measured "
          "lone-dot ceiling", file=sys.stderr, flush=True)
    return {
        "metric": "train_memes_per_sec_per_chip (vilbert_lmdb config: "
                  "LMDB-decoded features device-resident, fwd/bwd/opt per step"
                  + suffix + ")",
        "value": round(memes_per_sec, 2),
        "unit": "memes/sec",
        "vs_baseline": round(memes_per_sec / REFERENCE_MEMES_PER_SEC_ESTIMATE, 3),
        "extras": mfu,
    }


def _measure_serving() -> dict:
    """Secondary metric: the serving record config — int8 MXU quant + the
    fused Pallas layer kernels, seq-32 bucket at the measured peak batch.
    The round-3 sweep (same-run A/Bs, two sessions): 5657 @64, 5828 @80,
    6047/5970 @96, 6091 @112, 5995/5969 @128, 5875 @160, 5637 @256 — a
    flat peak across 96-128 (run-to-run relay variance ±1.5%), falling off
    beyond 160. scripts/bench_serving.py SERVING_BATCHES re-runs the grid;
    this banks the record point for the driver."""
    import jax
    import jax.numpy as jnp

    from multimodal_classification_tpu.config import facebook_vilbert_config
    from multimodal_classification_tpu.models.vilbert import (
        ViLBERTForClassification,
        dummy_batch,
    )
    from multimodal_classification_tpu.ops.quant import build_quant_tree
    from multimodal_classification_tpu.training.train import (
        make_quant_eval_step,
        model_inputs,
    )

    bs, seq = int(os.environ.get("BENCH_SERVING_BATCH", "112")), 32
    cfg = facebook_vilbert_config()  # fused kernels default ON
    model = ViLBERTForClassification(cfg)
    batch = dummy_batch(cfg, bs, seq, NUM_REGIONS)
    rng = np.random.default_rng(0)
    batch["visual_features"] = jnp.asarray(
        rng.standard_normal(batch["visual_features"].shape), jnp.bfloat16)
    stop_beat = _heartbeat("serving extras init+warmup")
    try:
        params = model.init(jax.random.key(0), **batch)["params"]
        quant = build_quant_tree(params)
        step = jax.jit(make_quant_eval_step(model))
        for _ in range(3):
            logits = step(params, quant, model_inputs(batch))
        _ = float(logits[0, 0])
    finally:
        stop_beat()
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        logits = step(params, quant, model_inputs(batch))
    _ = float(logits[0, 0])
    dt = time.perf_counter() - t0
    return {
        "serving_int8f_memes_per_sec": round(n * bs / dt, 1),
        "serving_batch": bs,
        "serving_seq_bucket": seq,
    }


def _run_stage(stage: str) -> int:
    """Child entry: run one measurement stage and print its JSON line(s).
    The parent takes the LAST JSON line, so print train-only first and the
    train+extras line after — if the parent kills us mid-extras it still
    banks the train number."""
    result = _measure_train(stacked=(stage == "fallback"))
    print(json.dumps(result), flush=True)
    deadline = float(os.environ.get("BENCH_DEADLINE", "0"))
    remaining = deadline - time.monotonic() if deadline else 1e9
    if stage == "headline" and os.environ.get("BENCH_EXTRAS", "1") == "1" \
            and remaining > 60:
        try:
            result.setdefault("extras", {}).update(_measure_serving())
            print(json.dumps(result), flush=True)
        except Exception as e:  # extras are best-effort
            print(f"serving extras failed: {e!r}", file=sys.stderr, flush=True)
    return 0


def _spawn(stage: str, timeout: float, deadline: float):
    """Run a measurement stage in a child (so a hung remote compile can be
    killed and the budget falls through to the next stage). Returns the last
    JSON line the child printed, or None.

    Adaptive budget: the ``timeout`` passed in reserves time for the
    fallback stage — but that reserve only matters while NO train number
    exists yet. The moment the child prints its first JSON line the train
    metric is banked and a fallback run would be pointless, so the kill
    deadline extends to the full bench budget (``deadline``), giving the
    best-effort serving extras the reserve instead of wasting it (on slow
    relay days the extras' executable loads can take minutes each)."""
    import subprocess

    env = dict(os.environ)
    env["PYTHONUNBUFFERED"] = "1"
    env["BENCH_DEADLINE"] = str(deadline)
    print(f"bench: stage={stage} timeout={timeout:.0f}s", file=sys.stderr,
          flush=True)
    # stderr merges into the pipe: the child's progress lines (ingest/upload/
    # compile prints) are the stall detector's heartbeat; non-JSON lines are
    # passed through to our stderr so the driver log keeps them
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--stage", stage],
        env=env, cwd=_HERE, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True, bufsize=1,
    )
    last = None
    kill_at = time.monotonic() + max(timeout, 1)
    # Relay stalls are the dominant failure mode now that the compile cache
    # is committed (measured: a single executable load can hang ~4 min while
    # the same program loads in seconds on retry). A child that prints
    # NOTHING NEW for BENCH_STALL seconds is stalled — kill it early and
    # leave the remaining budget to the caller's retry loop instead of
    # burning the whole stage timeout. 240 s covers the slowest warm-cache
    # phase observed (93 s compile+warmup) with 2.5× margin; a truly cold
    # compile can exceed it, which is what the stacked fallback is for.
    stall_s = float(os.environ.get("BENCH_STALL", "300"))
    last_out = time.monotonic()
    import selectors

    sel = selectors.DefaultSelector()
    sel.register(proc.stdout, selectors.EVENT_READ)
    buf = ""
    while True:
        if proc.poll() is not None and not sel.select(0):
            break
        now = time.monotonic()
        wait = min(kill_at, last_out + stall_s) - now
        if wait <= 0:
            proc.kill()
            proc.wait()
            why = "stalled" if now < kill_at else "timed out"
            print(f"bench: stage={stage} {why} "
                  f"({now - last_out:.0f}s since last output)",
                  file=sys.stderr, flush=True)
            break
        if not sel.select(min(wait, 1.0)):
            continue
        chunk = proc.stdout.readline()
        if chunk == "" and proc.poll() is not None:
            break
        last_out = time.monotonic()
        buf += chunk
        while "\n" in buf:
            line, buf = buf.split("\n", 1)
            line = line.strip()
            if not (line.startswith("{") and line.endswith("}")):
                if line:
                    print(line, file=sys.stderr, flush=True)
                continue
            try:
                last = json.loads(line)
            except json.JSONDecodeError:
                continue
            # train number banked → the fallback reserve is moot;
            # let the extras use the whole remaining budget
            if kill_at < deadline - 2:
                print("bench: train metric banked — extending stage "
                      "deadline to the full budget for extras",
                      file=sys.stderr, flush=True)
            kill_at = deadline - 2
    sel.close()
    return last


def main() -> int:
    if "--stage" in sys.argv:
        return _run_stage(sys.argv[sys.argv.index("--stage") + 1])

    budget = float(os.environ.get("BENCH_BUDGET", "540"))
    t0 = time.monotonic()
    deadline = t0 + budget
    # reserve enough for the fallback stage: ingest ~20 s + one-superlayer
    # compile (cached: seconds; cold: the stacked program is ~6× less HLO)
    reserve = float(os.environ.get("BENCH_FALLBACK_RESERVE", "170"))

    # Retry loop: relay stalls are transient (the same warm program that
    # hangs ~4 min loads in seconds on the next attempt), so when a stage
    # dies — stall-killed early by _spawn or genuinely timed out — cycle
    # back through the stages with whatever budget remains instead of
    # giving up after one headline + one fallback pass. A banked FALLBACK
    # number is kept but not final: any remaining budget goes into retrying
    # the HEADLINE stage, whose number replaces it (measured: a stall
    # window killed the headline once, the fallback banked 538/s, and the
    # headline would have delivered ~744/s on the next attempt).
    result = None
    have_headline = False
    for i, stage in enumerate(("headline", "fallback") * 3):
        if have_headline:
            break
        if result is not None and stage == "fallback":
            continue  # fallback already banked — only a headline upgrades it
        remaining = deadline - time.monotonic()
        if remaining < 60:
            break
        timeout = remaining - (reserve if i == 0 and result is None else 5)
        if timeout < 45:
            continue
        r = _spawn(stage, timeout=timeout, deadline=deadline)
        if r is not None:
            result = r
            have_headline = stage == "headline"
            # print the banked number IMMEDIATELY: if the driver's outer
            # timeout kills this parent during a later upgrade attempt, the
            # line is already on stdout (the driver takes the last JSON
            # line); an upgraded headline result prints again below and wins
            print(json.dumps(result), flush=True)
    if result is None:
        print("bench: all stages failed within budget", file=sys.stderr,
              flush=True)
        return 1
    print(json.dumps(result), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

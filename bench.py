"""Benchmark: xDeepFM training-step throughput on the default device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Shapes mirror the reference's canonical Criteo config (run.bash:12-26,
models/xdeepfm.py:42-44): 26 sparse fields (vocab 10k, emb 10), 13 dense,
CIN (256,128) split-half, DNN (256,256), batch 4096, Adam + sum-BCE + L2 reg.

vs_baseline: ratio vs the reference PyTorch implementation's train-step
throughput measured on this container's CPU (torch has no TPU path; the repo
publishes no numbers — BASELINE.md).  Measured 2026-08-17 with
/root/reference xDeepFM, identical shapes/optimizer: see REFERENCE_BASELINE.

Timing is slope-based (t(N2)-t(N1))/(N2-N1) over chained steps with a value
fetch at the end, so the per-call device-tunnel RTT cancels out and only true
device step time is measured.

Capture hardening (the driver runs this under an external timeout; a slow
tunnel compile must not cost the round its perf artifact): the measurement
runs in a CHILD process that checkpoints results to a state file in stages —
device health probe, a preliminary short-slope number right after compile,
then the refined long-slope number.  The parent holds no jax state; if the
deadline (BENCH_DEADLINE_S, default 500s) arrives mid-measurement it prints
the best checkpointed result and exits 0, leaving the child to finish in the
background rather than killing it (a TPU client killed mid-compile can wedge
the chip for the next run).
"""

import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

# examples/s of the reference torch implementation (CPU, this machine),
# measured via forward+sum-BCE+reg+backward+Adam step at batch 4096.
REFERENCE_BASELINE = 279.0

BATCH = 4096
N_SPARSE, N_DENSE, VOCAB, EMB = 26, 13, 10000, 10

# v5e TensorCore peak (bf16 matmul); fp32 runs as multi-pass emulation at a
# fraction of this.  Used only to express the measured model FLOP rate as an
# MFU percentage (BASELINE.json north star: CIN-layer FLOP utilization).
PEAK_FLOPS_BF16 = 197e12


def model_flops_per_step(batch=BATCH, m=N_SPARSE, d=EMB,
                         cin=(256, 128), dnn=(256, 256), n_dense=N_DENSE):
    """Analytic matmul FLOPs for one fwd+bwd canonical-xDeepFM step.

    Counted by hand because the hot CIN contraction runs inside a Pallas
    kernel, which XLA's cost_analysis() reports as an opaque custom call
    (0 flops).  Backward = 2x forward for every matmul (dW and dx), so
    fwd+bwd = 3x forward.  Embedding gathers/scatters and elementwise work
    are excluded (not FLOPs in the MFU sense).
    """
    fwd = 0.0
    # CIN: layer k contracts [B*D, H_{k-1}*M] @ [H_{k-1}*M, H_k]
    h_prev = m
    feat_total = 0
    for i, h in enumerate(cin):
        fwd += 2.0 * batch * d * (h_prev * m) * h
        last = i == len(cin) - 1
        keep = h if last else h // 2          # split_half
        feat_total += keep
        h_prev = h // 2 if not last else h
    fwd += 2.0 * batch * feat_total           # CIN logit head [feat_total, 1]
    # DNN tower: [B, M*D + n_dense] -> dnn -> 1
    width = m * d + n_dense
    for h in dnn:
        fwd += 2.0 * batch * width * h
        width = h
    fwd += 2.0 * batch * width
    return 3.0 * fwd


def pro_flops_per_step(batch=BATCH, m=N_SPARSE, d=EMB, cin=(256, 128),
                       dnn=(256, 256), n_dense=N_DENSE, hidden=(128, 64),
                       vocab=VOCAB):
    """Canonical xDeepFMPro analytic matmul FLOPs (model FLOPs: 3x forward;
    the flash-CE kernel's backward logit recompute is implementation work,
    not counted — MFU stays honest to the algorithm)."""
    base = model_flops_per_step(batch, m, d, cin, dnn, n_dense)
    in_dim = m * d + n_dense
    h0 = hidden[0]
    fwd = 0.0
    # label-aware attention: [in+h0] -> h0 -> in (sfg.py LabelAwareAttention)
    fwd += 2.0 * batch * (in_dim + h0) * h0 + 2.0 * batch * h0 * in_dim
    # shared trunk
    w = in_dim
    for h in hidden:
        fwd += 2.0 * batch * w * h
        w = h
    # m vocab-sized softmax heads + the dense regression head
    fwd += 2.0 * batch * w * (m * vocab) + 2.0 * batch * w * n_dense
    return base + 3.0 * fwd


def attn_flops_per_step(batch=BATCH, m=N_SPARSE, d=EMB, cin=(256, 128),
                        dnn=(256, 256), n_dense=N_DENSE, heads=2, layers=1,
                        v2=False):
    """Canonical xDeepFMAttention[V2] analytic matmul FLOPs (3x forward)."""
    fwd = 0.0
    h_prev = m
    S = 0
    for i, h in enumerate(cin):
        fwd += 2.0 * batch * d * (h_prev * m) * h
        last = i == len(cin) - 1
        S += h if last else h // 2
        h_prev = h if last else h // 2
    dh = max(d // heads, 1)
    for _ in range(layers):
        fwd += 4 * 2.0 * batch * S * d * d          # q/k/v/o projections
        fwd += 2 * 2.0 * batch * heads * S * S * dh  # scores + weighted sum
    fwd += 2.0 * batch * S * d * d + 2.0 * batch * S * d  # attention pooling
    if not v2:
        fwd += 2.0 * batch * d * S                  # output proj d -> S
        head_in = S
    else:
        head_in = d
    fwd += 2.0 * batch * head_in                    # cin_linear
    width = m * d + n_dense
    for h in dnn:
        fwd += 2.0 * batch * width * h
        width = h
    fwd += 2.0 * batch * width
    return 3.0 * fwd


def dien_flops_per_step(batch=BATCH, d=EMB, T=50, n_dense=1,
                        dnn=(256, 128)):
    """Canonical-bench DIEN (AUGRU + negsampling) analytic matmul FLOPs.
    Hidden size == item emb dim d; extractor GRU + evolution AUGRU + aux net
    (2 passes: pos+neg) + DIN attention MLP + DNN tower.  3x forward."""
    fwd = 0.0
    gru = 2.0 * batch * T * 3 * d * (d + d)         # x-proj + recurrent
    fwd += 2 * gru                                   # extractor + evolution
    # aux net MLP (100, 50, 1) over [h_t, e_{t+1}] for pos and neg streams
    w = 2 * d
    for h in (100, 50, 1):
        fwd += 2 * 2.0 * batch * T * w * h
        w = h
    # DIN attention local-activation unit (80, 40, 1) over 4d input
    w = 4 * d
    for h in (80, 40, 1):
        fwd += 2.0 * batch * T * w * h
        w = h
    # DNN tower over [user, item, score, interest]-ish concat (~4d + dense)
    width = 4 * d + n_dense
    for h in dnn:
        fwd += 2.0 * batch * width * h
        width = h
    fwd += 2.0 * batch * width
    return 3.0 * fwd


def result_json(step_s, refined):
    examples_per_s = BATCH / step_s
    tflops_per_s = model_flops_per_step() / step_s / 1e12
    return {
        "metric": "xdeepfm_train_examples_per_s",
        "value": round(examples_per_s, 1),
        "unit": "examples/s",
        "vs_baseline": round(examples_per_s / REFERENCE_BASELINE, 3),
        "model_tflops_per_s": round(tflops_per_s, 2),
        "mfu_pct_bf16_peak": round(
            100.0 * tflops_per_s * 1e12 / PEAK_FLOPS_BF16, 2
        ),
        "refined": bool(refined),
    }


def _write_state(path, obj):
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)  # atomic vs the polling parent


def child_main(state_path):
    """All device work lives here; progress is checkpointed to state_path."""
    import jax

    # persistent compilation cache: the train-step compile dominates bench
    # wall time (~minutes over the device link); cached reruns are seconds.
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", "/tmp/xdeepfm_tpu_jax_cache"
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    # Stage 0: device health probe — a tiny matmul with a value fetch.  If
    # the chip is wedged from a previous killed client this hangs here, the
    # parent deadline fires cheaply, and no big compile is left in flight.
    t0 = time.time()
    probe = float(
        (jnp.ones((128, 128)) @ jnp.ones((128, 128))).sum().block_until_ready()
    )
    _write_state(state_path, {
        "stage": "healthy", "probe_s": round(time.time() - t0, 2),
        "probe": probe,
    })

    from xdeepfm_tpu.features import DenseFeat, SparseFeat
    from xdeepfm_tpu.models import xDeepFM

    cols = [
        SparseFeat(f"C{i}", VOCAB, embedding_dim=EMB) for i in range(N_SPARSE)
    ] + [DenseFeat(f"I{i}", 1) for i in range(N_DENSE)]
    model = xDeepFM(
        cols, cols, dnn_hidden_units=(256, 256), cin_layer_size=(256, 128),
        seed=1024,
    )
    model.compile("adam", "binary_crossentropy", metrics=[])

    rng = np.random.default_rng(0)
    x = {}
    for f in model.schema.sparse:
        x[f.name] = rng.integers(0, VOCAB, size=BATCH).astype(np.int64)
    for f in model.schema.dense:
        x[f.name] = rng.uniform(0, 1, size=BATCH).astype(np.float32)
    batch = {k: jnp.asarray(v) for k, v in model.schema.pack(x).items()}
    y = jnp.asarray(rng.integers(0, 2, size=(BATCH, 1)).astype(np.float32))
    mask = jnp.ones((BATCH,), jnp.float32)

    def run(n, i0):
        t0 = time.time()
        total = None
        for i in range(i0, i0 + n):
            (
                model.params,
                model.batch_stats,
                model.opt_state,
                total,
                loss,
                mvals,
            ) = model._train_step(
                model.params, model.batch_stats, model.opt_state, batch, y,
                mask, i,
            )
        float(total)  # value fetch forces completion of the whole chain
        return time.time() - t0

    run(2, 0)  # compile + warmup

    # Stage 1: preliminary short-slope measurement, checkpointed immediately
    # so a deadline during the longer run still yields a real number.
    q1 = run(2, 2)
    q2 = run(8, 4)
    step_quick = (q2 - q1) / 6.0
    _write_state(state_path, {
        "stage": "preliminary", "result": result_json(step_quick, False),
    })

    # Stage 2: refined long-slope measurement, repeated 3x IN-PROCESS so the
    # headline is a median with a visible bracket — tunnel-noise drift across
    # rounds (e.g. r3 776.9k -> r4 728.9k ex/s) is then attributable from the
    # driver artifact alone.  Checkpointed after every repeat.
    n1, n2 = 10, 40
    i0, reps = 12, []
    for _ in range(3):
        d1 = run(n1, i0)
        d2 = run(n2, i0 + n1)
        i0 += n1 + n2
        reps.append((d2 - d1) / (n2 - n1))
        step_s = float(np.median(reps))
        result = result_json(step_s, True)
        result["repeats_step_ms"] = [round(s * 1e3, 3) for s in reps]
        result["repeat_bracket_ms"] = {
            "min": round(min(reps) * 1e3, 3),
            "median": round(step_s * 1e3, 3),
            "max": round(max(reps) * 1e3, 3),
        }
        _write_state(state_path, {"stage": "refined", "result": result})

    # Stage 3: the contested model families (VERDICT r3 #5) — Pro/attention/
    # DIEN step rows, checkpointed one at a time so a deadline mid-family
    # still yields the flagship number + whatever finished.  Trim with
    # BENCH_MODELS (e.g. BENCH_MODELS=pro or BENCH_MODELS= for none).
    extras = [
        s for s in os.environ.get(
            # lazy104 (the packed-group capacity headline) ahead of the
            # cheaper serve rows and attn2 so a deadline cut can't cost it
            "BENCH_MODELS", "pro,attn,dien,lazy104,serve,attn2,serve_pro"
        ).split(",")
        if s
    ]
    if extras:
        result["extra_models"] = {}
        from xdeepfm_tpu import models as M
        from xdeepfm_tpu import pro as PRO
        from xdeepfm_tpu.features import VarLenSparseFeat

        def measure(model, x, y_np):
            model.compile("adam", "binary_crossentropy", metrics=[])
            b = {k: jnp.asarray(v) for k, v in model.schema.pack(x).items()}
            yv = jnp.asarray(y_np)
            mv = jnp.ones((BATCH,), jnp.float32)

            def go(n, i0):
                t0 = time.time()
                total = None
                for i in range(i0, i0 + n):
                    (
                        model.params, model.batch_stats, model.opt_state,
                        total, _, _,
                    ) = model._train_step(
                        model.params, model.batch_stats, model.opt_state,
                        b, yv, mv, i,
                    )
                float(total)
                return time.time() - t0

            go(2, 0)
            e1 = go(4, 2)
            e2 = go(16, 6)
            return (e2 - e1) / 12.0

        def criteo_x():
            xx = {
                f"C{i}": rng.integers(0, VOCAB, BATCH).astype(np.int64)
                for i in range(N_SPARSE)
            }
            xx.update({
                f"I{i}": rng.uniform(0, 1, BATCH).astype(np.float32)
                for i in range(N_DENSE)
            })
            return xx, rng.integers(0, 2, (BATCH, 1)).astype(np.float32)

        def dien_x():
            maxlen = 50
            lengths = rng.integers(1, maxlen + 1, BATCH)
            sm = np.arange(maxlen)[None, :] < lengths[:, None]
            xx = {
                "user": rng.integers(0, VOCAB, BATCH).astype(np.int64),
                "item": rng.integers(0, VOCAB, BATCH).astype(np.int64),
                "score": rng.uniform(0, 1, BATCH).astype(np.float32),
                "hist_item": (
                    rng.integers(1, VOCAB, (BATCH, maxlen)) * sm
                ).astype(np.int64),
                "neg_hist_item": (
                    rng.integers(1, VOCAB, (BATCH, maxlen)) * sm
                ).astype(np.int64),
                "seq_length": lengths.astype(np.int64),
            }
            return xx, rng.integers(0, 2, (BATCH, 1)).astype(np.float32)

        def dien_cols():
            return [
                SparseFeat("user", VOCAB, embedding_dim=EMB),
                SparseFeat("item", VOCAB, embedding_dim=EMB),
                DenseFeat("score", 1),
                VarLenSparseFeat(
                    SparseFeat("hist_item", VOCAB, embedding_dim=EMB,
                               embedding_name="item"),
                    maxlen=50, length_name="seq_length",
                ),
                VarLenSparseFeat(
                    SparseFeat("neg_hist_item", VOCAB, embedding_dim=EMB,
                               embedding_name="item"),
                    maxlen=50, length_name="seq_length",
                ),
            ]

        family = {
            "pro": (
                lambda: PRO.xDeepFMPro(cols, cols), criteo_x,
                pro_flops_per_step,
            ),
            "attn": (
                lambda: M.xDeepFMAttention(cols, cols, cin_num_heads=2),
                criteo_x, attn_flops_per_step,
            ),
            "attn2": (
                lambda: M.xDeepFMAttentionV2(
                    cols, cols, cin_num_heads=4, cin_num_attn_layers=2
                ),
                criteo_x,
                lambda: attn_flops_per_step(heads=4, layers=2, v2=True),
            ),
            "dien": (
                lambda: M.DIEN(dien_cols(), ["item"], gru_type="AUGRU",
                               use_negsampling=True),
                dien_x, dien_flops_per_step,
            ),
        }
        def measure_serving(serve_model):
            """Forward-only scoring throughput at the Scorer's default batch
            (serving.py).  Chained: each iteration's predictions perturb the
            next batch's dense input (materially changing inputs defeat the
            tunnel's content cache) and the chain ends in a value fetch."""
            SB = 8192
            xs = {
                f"C{i}": rng.integers(0, VOCAB, SB).astype(np.int64)
                for i in range(N_SPARSE)
            }
            xs.update({
                f"I{i}": rng.uniform(0, 1, SB).astype(np.float32)
                for i in range(N_DENSE)
            })
            base = {
                k: jnp.asarray(v)
                for k, v in serve_model.schema.pack(xs).items()
            }

            def go(n):
                t0 = time.time()
                bb = dict(base)
                pred = None
                for _ in range(n):
                    pred = serve_model._predict_step(
                        serve_model.params, serve_model.batch_stats, bb
                    )
                    bb = dict(base)
                    bb["dense"] = base["dense"] + jnp.sum(pred) * 1e-6
                float(jnp.sum(pred))
                return time.time() - t0

            go(2)
            e1 = go(4)
            e2 = go(16)
            step = (e2 - e1) / 12.0
            return {
                "step_ms": round(step * 1e3, 2),
                "examples_per_s": round(SB / step, 0),
                "batch": SB,
                "mode": "predict (serving.Scorer path)",
            }

        def measure_lazy104():
            """Capacity headline: 104M-row (26 x 4M-vocab) tables, lazy
            row-sparse adagrad with the packed param|state layout — only
            touched rows are read/written (one gather + one scatter per
            table per step), so table size stops mattering to step time.
            Dense optimizers cannot hold this configuration at all.

            Runs in a SUBPROCESS: packing the tables transiently peaks at
            ~16.6 GB of HBM (BASELINE.md round-5), which needs a clean
            arena — this bench process already holds the other models'
            state."""
            out = subprocess.run(
                [
                    sys.executable,
                    os.path.join(
                        os.path.dirname(os.path.abspath(__file__)),
                        "scripts", "bench_lazy.py",
                    ),
                    "4000000", "adagrad", "lazy_split",
                ],
                capture_output=True, text=True, timeout=1200,
            )
            for line in out.stdout.splitlines():
                line = line.strip()
                if line.startswith("{"):
                    row = json.loads(line)
                    row["mode"] = (
                        "lazy+split packed adagrad (capacity headline; "
                        "dense optimizers OOM at this size)"
                    )
                    return row
            raise RuntimeError(
                f"no JSON from bench_lazy (rc {out.returncode}): "
                f"{(out.stdout + out.stderr)[-200:]}"
            )

        for name in extras:
            if name == "lazy104":
                try:
                    result["extra_models"]["lazy104"] = measure_lazy104()
                except Exception as e:
                    result["extra_models"]["lazy104"] = {
                        "error": repr(e)[:160]
                    }
                _write_state(state_path, {"stage": "extras", "result": result})
                continue
            if name in ("serve", "serve_pro"):
                try:
                    if name == "serve":
                        sm = model  # flagship, already compiled
                    else:
                        # Pro's forward-only path (SFG heads skipped clean)
                        sm = PRO.xDeepFMPro(cols, cols)
                        sm.compile("adam", "binary_crossentropy", metrics=[])
                    result["extra_models"][name] = measure_serving(sm)
                except Exception as e:
                    result["extra_models"][name] = {"error": repr(e)[:160]}
                _write_state(state_path, {"stage": "extras", "result": result})
                continue
            if name not in family:
                continue
            build, make_x, flops = family[name]
            try:
                xx, yy = make_x()
                step = measure(build(), xx, yy)
                tf = flops() / step / 1e12
                result["extra_models"][name] = {
                    "step_ms": round(step * 1e3, 2),
                    "examples_per_s": round(BATCH / step, 0),
                    "model_tflops_per_s": round(tf, 2),
                    "mfu_pct_bf16_peak": round(
                        100.0 * tf * 1e12 / PEAK_FLOPS_BF16, 2
                    ),
                }
            except Exception as e:  # keep the flagship artifact alive
                result["extra_models"][name] = {"error": repr(e)[:160]}
            _write_state(state_path, {"stage": "extras", "result": result})

    _write_state(state_path, {"stage": "done", "result": result})


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "--child":
        child_main(sys.argv[2])
        return
    if len(sys.argv) >= 2 and sys.argv[1] == "--inline":
        # debugging path: single process, result straight to stdout
        with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as f:
            state_path = f.name
        child_main(state_path)
        with open(state_path) as f:
            print(json.dumps(json.load(f)["result"]))
        return

    deadline = float(os.environ.get("BENCH_DEADLINE_S", "540"))
    fd, state_path = tempfile.mkstemp(suffix=".json", prefix="bench_state_")
    os.close(fd)
    os.unlink(state_path)
    log_path = os.environ.get("BENCH_CHILD_LOG", "/tmp/bench_child.log")
    with open(log_path, "w") as log:
        child = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--child", state_path],
            stdout=log, stderr=subprocess.STDOUT,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
    t0 = time.time()
    state = None
    while time.time() - t0 < deadline:
        if os.path.exists(state_path):
            try:
                with open(state_path) as f:
                    state = json.load(f)
            except (json.JSONDecodeError, OSError):
                pass  # mid-replace; next poll sees the full file
        if state is not None and state.get("stage") == "done":
            break
        if child.poll() is not None:
            break  # child exited (done or crashed) — use what it left
        time.sleep(1.0)

    if state is None and os.path.exists(state_path):
        try:
            with open(state_path) as f:
                state = json.load(f)
        except (json.JSONDecodeError, OSError):
            state = None

    if state is not None and "result" in state:
        print(json.dumps(state["result"]))
        # deadline hit before "done": leave the child to finish on its own —
        # killing a TPU client mid-dispatch risks wedging the chip.
        if state.get("stage") == "done" or child.poll() is not None:
            try:
                os.unlink(state_path)
            except OSError:
                pass
        sys.exit(0)

    # No measurement at all: fail fast and loudly (rc != 0, no JSON line) so
    # the driver records an honest failure instead of a timeout.
    stage = (state or {}).get("stage", "no state (device init or compile "
                                       "never completed)")
    print(f"bench: no result before deadline; last stage: {stage}; "
          f"child log: {log_path}", file=sys.stderr)
    sys.exit(2 if child.poll() is None else 3)


if __name__ == "__main__":
    main()

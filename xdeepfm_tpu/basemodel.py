"""Keras-style training engine (reference: ``deepctr/models/basemodel.py``).

TPU-native redesign of ``BaseModel.fit/evaluate/predict/compile``:

* the whole training step — embedding lookup, forward, loss (+L2-in-loss
  reg, aux loss), backward, optax update, train metrics — is **one jitted XLA
  program**; only scalar metrics leave the device each step (the reference
  syncs full predictions to CPU per batch, ``basemodel.py:264-269``),
* the final partial batch is padded + masked so a single compiled step serves
  every batch size (no recompiles, static shapes),
* loss is sum-reduced then normalized by sample count for the epoch log,
  exactly as ``basemodel.py:254,278``,
* train metrics are means of per-batch values; val metrics are pooled over the
  full set — both reference behaviors (``basemodel.py:279-285``).

Model classes subclass :class:`BaseModel`, implement ``_build_module()``
returning a flax module with signature ``module(batch, training) -> dict`` with
keys ``pred`` ([B,1] or [B,num_tasks]) and optional ``aux_loss`` (scalar,
already alpha-weighted, cf. ``basemodel.py:430-431``).
"""

from __future__ import annotations

import time
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from .callbacks import CallbackList, History
from .features import FeatureSchema
from .metrics import DEVICE_METRICS, HOST_METRICS

# embedding_optimizer='auto' crossover: stacked tables at or above this many
# rows train lazily (row-sparse updates), below it dense streaming wins —
# measured on v5e (BASELINE.md "Embedding-optimizer regimes").  The round-5
# packed param|state GROUP layout (main + linear fused into one array: one
# gather + one scatter per step TOTAL) made the lazy step table-size-
# independent (~20-22 ms at 10M and 104M rows alike), moving the crossover
# down from ~30-50M to ~5-6M rows (same-process pairs: dense 18.6 vs
# packed-group 23.9 ms at 2.6M; dense 26.6 vs 22.2 at 10.4M).  Module-level
# so deployments on other HBM/bandwidth envelopes (and tests) can tune it.
AUTO_LAZY_MIN_ROWS = 6_000_000


def _loss_fn_single(name):
    """Sum-reduced masked losses (reference ``basemodel.py:463-481`` maps
    strings to torch functionals called with reduction='sum')."""
    if name == "binary_crossentropy":

        def bce(y_pred, y_true, mask):
            p = jnp.clip(y_pred, 1e-7, 1 - 1e-7)
            ll = -(y_true * jnp.log(p) + (1 - y_true) * jnp.log(1 - p))
            return jnp.sum(ll * mask)

        return bce
    if name == "mse":

        def mse(y_pred, y_true, mask):
            return jnp.sum(mask * (y_pred - y_true) ** 2)

        return mse
    if name == "mae":

        def mae(y_pred, y_true, mask):
            return jnp.sum(mask * jnp.abs(y_pred - y_true))

        return mae
    raise NotImplementedError(name)


def _get_optimizer(optimizer, lr: Optional[float] = None):
    """String -> optax optimizer with the reference's torch defaults
    (``basemodel.py:447-461``)."""
    if not isinstance(optimizer, str):
        return optimizer
    if optimizer == "sgd":
        return optax.sgd(lr if lr is not None else 0.01)
    if optimizer == "adam":
        return optax.adam(lr if lr is not None else 1e-3, eps=1e-8)
    if optimizer == "adagrad":
        return optax.adagrad(lr if lr is not None else 0.01, eps=1e-10)
    if optimizer == "rmsprop":
        return optax.rmsprop(lr if lr is not None else 0.01, decay=0.99, eps=1e-8)
    raise NotImplementedError(optimizer)


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def _tree_get(tree, path):
    for seg in path.split("/"):
        tree = tree[seg]
    return tree


def _tree_set(tree, path, val):
    segs = path.split("/")
    if len(segs) == 1:
        return {**tree, segs[0]: val}
    return {
        **tree,
        segs[0]: _tree_set(tree[segs[0]], "/".join(segs[1:]), val),
    }


def _tree_del(tree, path):
    segs = path.split("/")
    if len(segs) == 1:
        return {k: v for k, v in tree.items() if k != segs[0]}
    return {
        **tree,
        segs[0]: _tree_del(tree[segs[0]], "/".join(segs[1:])),
    }


class BaseModel:
    def __init__(
        self,
        linear_feature_columns,
        dnn_feature_columns,
        l2_reg_linear=1e-5,
        l2_reg_embedding=1e-5,
        init_std=1e-4,
        seed=1024,
        task="binary",
        device=None,
        gpus=None,
    ):
        # device/gpus accepted for API parity; placement is JAX-managed.
        del device, gpus
        self.linear_feature_columns = tuple(linear_feature_columns)
        self.dnn_feature_columns = tuple(dnn_feature_columns)
        self.schema = FeatureSchema.build(
            list(linear_feature_columns) + list(dnn_feature_columns)
        )
        self.init_std = init_std
        self.seed = seed
        self.task = task
        self.num_tasks = None  # set by multitask models

        self.regularization_weight: List[Tuple[Tuple[str, ...], float, float]] = []
        # reference registers embeddings + linear in __init__
        # (basemodel.py:124-127); module naming convention makes these paths.
        self.add_regularization_weight(("embedding_dict/",), l2=l2_reg_embedding)
        self.add_regularization_weight(("linear_model/",), l2=l2_reg_linear)

        self.stop_training = False
        self.history = History()
        self.metrics = {}
        self.metrics_names = ["loss"]
        self._compiled = None
        self.module = None
        self._lazy_tables = {}
        self._packed_tables = {}

    def _finalize(self):
        """Build the flax module + initialize variables.  Called at the end of
        each subclass ``__init__`` (after model hyperparameters are set)."""
        self.module = self._build_module()
        self._init_variables()

    # ------------------------------------------------------------------ build

    def _build_module(self):
        raise NotImplementedError

    def _dummy_batch(self, n=2):
        batch = {}
        if self.schema.sparse:
            batch["sparse"] = np.zeros((n, self.schema.n_sparse), np.int32)
        if self.schema.dense:
            batch["dense"] = np.zeros((n, self.schema.dense_dim), np.float32)
        for f in self.schema.varlen:
            batch["vl_" + f.name] = np.zeros((n, f.maxlen), np.int32)
            if f.length_name is not None:
                batch["len_" + f.length_name] = np.ones((n, 1), np.int32)
        # labels are available to modules at train time (SFG decoders etc.,
        # reference forward_with_sfg(x, y), basemodel_sfg.py:403-417); included
        # here so label-conditioned params materialize at init.
        batch["labels"] = np.zeros((n, 1), np.float32)
        batch["sample_mask"] = np.ones((n,), np.float32)
        return batch

    def _init_variables(self):
        key = jax.random.PRNGKey(self.seed)
        pkey, dkey = jax.random.split(key)
        variables = self.module.init(
            {"params": pkey, "dropout": dkey},
            jax.tree.map(jnp.asarray, self._dummy_batch()),
            training=True,
        )
        variables = flax.core.unfreeze(variables)
        self.params = variables.get("params", {})
        self.batch_stats = variables.get("batch_stats", {})
        # dropout stream: the 'rbg' generator lowers to the TPU hardware RNG
        # (XLA RngBitGenerator) instead of threefry's ~0.5 ms of per-step
        # vector hashing at bench shapes (round-4 probe: nodrop saved 0.46 ms
        # of a 16.9 ms xDeepFMPro step).  Init streams above stay threefry so
        # seeded initial weights are unchanged.
        try:
            self._base_rng = jax.random.key(self.seed + 1, impl="rbg")
        except Exception:  # older jax without typed-key impls
            self._base_rng = jax.random.PRNGKey(self.seed + 1)

    # ------------------------------------------------------- regularization

    def add_regularization_weight(self, pattern, l1=0.0, l2=0.0):
        """Register (path-substring-pattern, l1, l2).  Equivalent of the
        reference's tensor-list registry (``basemodel.py:402-410``) keyed by
        parameter paths instead of object identity."""
        if isinstance(pattern, str):
            pattern = (pattern,)
        self.regularization_weight.append((tuple(pattern), l1, l2))

    def _regularization_loss(self, params, lazy_paths=(), skip_lazy=False):
        """sum(l1*|w|) + sum(l2*w^2) over matched params
        (``basemodel.py:412-428``).

        Params whose path is in ``lazy_paths`` contribute their VALUE to the
        loss but are stop-gradiented — their regularization gradient is applied
        row-sparsely by the lazy embedding optimizer instead of as a dense
        full-table gradient.  With ``skip_lazy`` they are omitted entirely
        (gradient-split mode: the leaf holds compacted touched rows, not the
        table; the engine adds the full-table reg value as a constant)."""
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        total = jnp.zeros(())
        for pattern, l1, l2 in self.regularization_weight:
            for path, w in flat:
                p = _path_str(path)
                if all(s in p for s in pattern):
                    if p in lazy_paths:
                        if skip_lazy:
                            continue
                        w = jax.lax.stop_gradient(w)
                    if l1 > 0:
                        total = total + jnp.sum(l1 * jnp.abs(w))
                    if l2 > 0:
                        total = total + jnp.sum(l2 * jnp.square(w))
        return total

    def _reg_coeffs_for(self, path_str):
        l1t = l2t = 0.0
        for pattern, l1, l2 in self.regularization_weight:
            if all(s in path_str for s in pattern):
                l1t += l1
                l2t += l2
        return l1t, l2t

    # ------------------------------------------------------------- compile

    def compile(self, optimizer, loss=None, metrics=None, lr=None,
                embedding_optimizer="dense", matmul_precision=None,
                embedding_gradient="auto", fused_lookup="auto",
                embedding_layout="auto", embedding_state_dtype="float32"):
        """String (or optax GradientTransformation) optimizer, string loss
        name(s), metric-name list (``basemodel.py:433-445``).

        embedding_optimizer='lazy' switches the stacked embedding tables to a
        row-sparse (lazy) optimizer update — only touched rows get moment and
        weight updates, and their L2 reg gradient applies lazily too.  Requires
        a string optimizer in {'adam', 'adagrad'}.  Default 'dense' matches the
        reference exactly.  'auto' picks lazy for >=30M-row stacked tables
        (the measured v5e crossover, BASELINE.md) and dense otherwise.

        embedding_gradient (lazy mode only): 'dense' materializes the full
        [rows, dim] table cotangent each step (autodiff default); 'split' cuts
        autodiff at the lookup boundary — the step gathers the batch's touched
        rows into a compact [N, dim] block, differentiates w.r.t. that block,
        and the lazy optimizer scatters straight back into the table, so NO
        full-table gradient/update pass ever runs.  The L2-reg VALUE (which
        only feeds the logged loss; its gradient applies row-wise) is tracked
        incrementally as a sum(w^2) scalar in the optimizer state — zero
        full-table reads per step for l2-only tables.  'auto' = split on a
        single device, dense otherwise (a global sort over sharded ids would
        ride collectives).

        matmul_precision: None (full fp32, reference parity) or 'bfloat16' —
        single-pass bf16 MXU for the tower matmuls (opt-in mixed precision).

        fused_lookup: dense-optimizer train steps gather SAME-LAYOUT stacked
        tables (e.g. the main table_d10 and the linear table_d1, which index
        with identical offsets) through ONE column-concatenated random-access
        walk, with one combined backward scatter — instead of a gather+scatter
        pair per table.  Bit-equivalent math up to fp32 scatter accumulation
        order.  'auto' (default) enables it on a single device; True forces,
        False disables.

        embedding_layout (lazy+split mode only): 'packed' fuses every
        GROUP of same-id-pattern lazy tables (e.g. the main table_d10 and
        the linear table_d1) together with the optimizer's row state (adam
        m|v, adagrad acc) into ONE [rows, sum_dim + state] array, so each
        step performs ONE per-occurrence gather (serving every member's
        forward block AND the moments) and ONE combined scatter — XLA
        serializes row walks per index; the walk count is the cost model
        (104M rows: 52.75 -> 19.45 ms/step).  'flat' keeps separate
        [rows, dim] param + [rows, k*dim] state arrays.  'auto' = packed
        whenever lazy+split.
        The packed layout is internal: get/set_weights, checkpoints, and
        predict all speak the canonical table_d{d} format (checkpoints are
        byte-compatible across layouts).

        embedding_state_dtype (packed layout only): 'bfloat16' stores the
        optimizer's row state as bf16 pairs bit-packed into fp32 columns —
        half the state HBM (104M-row ADAM fits one 16 GiB chip this way;
        fp32 m|v cannot).  Row math still runs in fp32 each step; moments
        round to bf16 between steps, perturbing trajectories slightly.
        Checkpoints stay fp32-canonical (decoded on save, re-encoded on
        load).  Default 'float32' = exact.
        """
        self._matmul_precision = matmul_precision
        if self._packed_tables:
            # re-compile on a packed model: restore canonical storage first
            self._unpack_params()
        if embedding_layout not in ("auto", "packed", "flat"):
            raise ValueError(embedding_layout)
        state_dt = jnp.dtype(
            {"float32": jnp.float32, "bfloat16": jnp.bfloat16}.get(
                embedding_state_dtype, embedding_state_dtype
            )
        )
        if state_dt not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16)):
            raise ValueError(embedding_state_dtype)
        if state_dt == jnp.dtype(jnp.bfloat16) and embedding_layout == "flat":
            raise ValueError(
                "embedding_state_dtype='bfloat16' requires the packed "
                "embedding_layout"
            )
        self._packed_state_dtype = state_dt
        if embedding_gradient not in ("auto", "dense", "split"):
            raise ValueError(embedding_gradient)
        if embedding_gradient == "auto":
            embedding_gradient = (
                "split" if jax.device_count() == 1 else "dense"
            )
        self._lazy_split = embedding_gradient == "split"
        self.metrics_names = ["loss"]
        if isinstance(loss, list):
            self.loss_names = list(loss)
        else:
            self.loss_names = loss
        self.metrics = self._get_metrics(metrics)

        self._lazy_tables = {}
        if embedding_optimizer == "auto":
            # measured crossover on v5e (BASELINE.md): XLA row scatters are
            # serialized per index, so dense full-table streaming wins below
            # ~50M rows; above, lazy is faster AND the only mode that fits
            # (dense adam OOMs one chip from ~65M rows).
            from .optimizers import LAZY_OPTIMIZERS as _LO

            max_rows = max(
                (
                    w.shape[0]
                    for p, w in jax.tree_util.tree_flatten_with_path(
                        self.params
                    )[0]
                    if "table_d" in _path_str(p)
                ),
                default=0,
            )
            embedding_optimizer = (
                "lazy"
                if max_rows >= AUTO_LAZY_MIN_ROWS
                and isinstance(optimizer, str)
                and optimizer in _LO
                else "dense"
            )
        if embedding_optimizer == "lazy":
            from .optimizers import LAZY_OPTIMIZERS

            if not (isinstance(optimizer, str) and optimizer in LAZY_OPTIMIZERS):
                raise ValueError(
                    "embedding_optimizer='lazy' requires optimizer in "
                    f"{sorted(LAZY_OPTIMIZERS)}"
                )
            self._lazy_tables = self._build_lazy_specs()
            self._lazy_kind = optimizer
            self._lazy_lr = lr if lr is not None else (
                LAZY_OPTIMIZERS[optimizer][2]["lr"]
            )
            # pack BEFORE the optimizer labels: grouping removes non-host
            # member paths from the params tree
            self._packed_tables = {}
            self._packed_groups = []
            if (
                embedding_layout in ("auto", "packed")
                and self._lazy_tables
                and self._lazy_split
            ):
                self._pack_params()
            base = _get_optimizer(optimizer, lr)
            if self._lazy_tables:
                import optax as _optax

                lazy_paths = set(self._lazy_tables)

                def label(path, leaf):
                    return (
                        "lazy" if _path_str(path) in lazy_paths else "dense"
                    )

                labels = jax.tree_util.tree_map_with_path(label, self.params)
                self.optimizer = _optax.multi_transform(
                    {"dense": base, "lazy": _optax.set_to_zero()}, labels
                )
            else:
                self.optimizer = base
        else:
            self.optimizer = _get_optimizer(optimizer, lr)
            self._packed_tables = {}
            self._packed_groups = []
        self._fused_dense_groups = []
        if (
            not self._lazy_tables
            and fused_lookup in ("auto", True)
            and (fused_lookup is True or jax.device_count() == 1)
        ):
            self._fused_dense_groups = self._build_fused_groups()
        if embedding_layout == "packed" and not self._packed_tables:
            raise ValueError(
                "embedding_layout='packed' requires embedding_optimizer="
                "'lazy' with embedding_gradient='split'"
            )
        if (
            self._packed_state_dtype == jnp.dtype(jnp.bfloat16)
            and not self._packed_tables
        ):
            raise ValueError(
                "embedding_state_dtype='bfloat16' requires lazy+split "
                "(packed layout) — nothing was packed under this config"
            )
        self._init_opt_state()
        self._build_steps()

    # ------------------------------------------------- packed lazy layout

    def _pack_params(self):
        """Switch every lazy table to the packed GROUP layout.

        Tables with IDENTICAL id patterns (same touched-entry list and row
        count — e.g. the main ``table_d10`` and the linear ``table_d1``)
        fuse into ONE ``[rows, sum_d + state_slots(k*sum_d)]`` array:
        member param columns side by side, then the optimizer's row state
        for the whole group.  The train step then walks HBM ONCE per
        direction for the entire group — at 104M rows the main+linear
        fusion halves the two remaining serialized row walks again
        (BASELINE.md round-5 floor: one walk pair ~14.8 ms).  Tables with
        unique id patterns form singleton groups (the round-4 negative
        result stands: different-id sites don't shrink rows touched).

        The group array lives under its FIRST (largest) member's param
        path; other member paths are REMOVED from the params tree and
        reconstructed as column slices by the engine's canonical view.
        Records ``self._packed_groups`` (mechanics) and
        ``self._packed_tables = {path: (dim, k)}`` (introspection)."""
        import os

        from .optimizers import LAZY_ROW_MATH, state_slots

        _, k = LAZY_ROW_MATH[self._lazy_kind]
        state_dt = self._packed_state_dtype

        def _padded_bytes(rows, w):
            # measured TPU minor-dim storage rule (v5e): widths <= 8 are
            # stored compact, wider pads up to the next multiple of 8
            # (e.g. [104M, 10] occupies 6.66 GB, not 4.16)
            return rows * (w if w <= 8 else -(-w // 8) * 8) * 4

        params = self.params

        # ---- group by identical (entries, rows): one walk serves all ----
        by_key = {}
        for path, (entries, l1, l2) in self._lazy_tables.items():
            rows = _tree_get(params, path).shape[0]
            by_key.setdefault((entries, rows), []).append((path, l1, l2))
        groups = []
        for (entries, rows), members in sorted(by_key.items(), key=str):
            # largest member first: it hosts the group array AND packs
            # without a spill round-trip
            members = sorted(
                members,
                key=lambda m: -_tree_get(params, m[0]).size,
            )
            mem = []
            off = 0
            for path, l1, l2 in members:
                dim = _tree_get(params, path).shape[1]
                mem.append(
                    {"path": path, "dim": dim, "off": off, "l1": l1,
                     "l2": l2}
                )
                off += dim
            groups.append({
                "host": members[0][0],
                "members": mem,
                "entries": entries,
                "rows": rows,
                "dsum": off,
                "k": k,
                "slots": state_slots(k * off, state_dt),
            })
        # pack the LARGEST group first (its transient peak is the tallest)
        groups.sort(key=lambda g: -(g["rows"] * g["dsum"]))

        # capacity estimate: the first group's old host table + its new
        # group array coexist, plus every other canonical table — spill
        # the others to host when that crowds the budget
        budget = float(os.environ.get("XDEEPFM_HBM_BUDGET", 16 * 2**30))
        g0 = groups[0]
        host0 = _tree_get(params, g0["host"])
        peak = (
            _padded_bytes(*host0.shape)
            + _padded_bytes(g0["rows"], g0["dsum"] + g0["slots"])
            + sum(
                _padded_bytes(*_tree_get(params, p).shape)
                for p in self._lazy_tables
                if p != g0["host"]
            )
        )
        spilled = {}
        if peak > 0.93 * budget:
            for p in self._lazy_tables:
                if p == g0["host"]:
                    continue
                t = _tree_get(params, p)
                spilled[p] = np.asarray(t)
                t.delete()
                params = _tree_set(params, p, None)

        # zero state columns are a valid encoding in EVERY state dtype
        # (bf16 pairs of zeros bitcast to fp32 zero columns)
        @partial(jax.jit, static_argnums=1)
        def _seed(table, extra):
            rows = table.shape[0]
            return jnp.concatenate(
                [table, jnp.zeros((rows, extra), table.dtype)], axis=1
            )

        @partial(jax.jit, static_argnums=2, donate_argnums=0)
        def _fill(group_arr, member_table, off):
            return jax.lax.dynamic_update_slice_in_dim(
                group_arr, member_table, off, axis=1
            )

        for g in groups:
            W = g["dsum"] + g["slots"]
            # 1. seed the group array from the host member + zeros; the
            #    other members' columns fill in-place (donated) afterwards,
            #    so the transient never exceeds old-host + new-group
            host_t = (
                jnp.asarray(spilled.pop(g["host"]))
                if g["host"] in spilled
                else _tree_get(params, g["host"])
            )
            arr = _seed(host_t, W - g["members"][0]["dim"])
            arr.block_until_ready()
            # an un-donatable old buffer is NOT freed while the params tree
            # references it — release explicitly or it leaks its padded
            # footprint for the process lifetime
            try:
                host_t.delete()
            except Exception:
                pass
            params = _tree_set(params, g["host"], None)
            for m in g["members"][1:]:
                t = (
                    jnp.asarray(spilled.pop(m["path"]))
                    if m["path"] in spilled
                    else _tree_get(params, m["path"])
                )
                arr = _fill(arr, t, m["off"])
                arr.block_until_ready()
                try:
                    t.delete()
                except Exception:
                    pass
                params = _tree_del(params, m["path"])
            params = _tree_set(params, g["host"], arr)
            for m in g["members"]:
                self._packed_tables[m["path"]] = (m["dim"], k)
        self._packed_groups = groups
        self.params = params

    @staticmethod
    def _member_state_slice(st_all, g, m):
        """[R, k*dsum] fp32 group state -> the member's canonical
        [R, k*dim] (state layout is k stacked dsum-wide blocks, e.g.
        adam's m_all | v_all)."""
        R = st_all.shape[0]
        return st_all.reshape(R, g["k"], g["dsum"])[
            :, :, m["off"] : m["off"] + m["dim"]
        ].reshape(R, g["k"] * m["dim"])

    def _unpack_params(self):
        """Restore canonical [rows, dim] tables from the packed group
        layout (re-compile path; the in-array row states are discarded
        exactly as a flat-layout re-compile re-initializes its state)."""
        params = self.params
        for g in self._packed_groups:
            arr = _tree_get(params, g["host"])
            for m in g["members"]:
                params = _tree_set(
                    params, m["path"],
                    jnp.array(arr[:, m["off"] : m["off"] + m["dim"]]),
                )
            try:
                arr.delete()  # the tree's reference would otherwise pin
            except Exception:  # the wide buffer for the process lifetime
                pass
        self.params = params
        self._packed_tables = {}
        self._packed_groups = []

    def _canonical_params(self, params):
        """View of a param tree with each packed group expanded back into
        its members' canonical [rows, dim] tables.  Under jit the slices
        are dead — hence free — wherever lookups consume the engine's
        ``_compact`` occurrence blocks."""
        for g in self._packed_groups:
            arr = _tree_get(params, g["host"])
            for m in g["members"]:
                params = _tree_set(
                    params, m["path"],
                    arr[:, m["off"] : m["off"] + m["dim"]],
                )
        return params

    def _build_fused_groups(self):
        """Groups of same-layout stacked tables for the dense fused lookup:
        [(entries, (path, ...))] where every path's table has identical row
        count and touched-id pattern, so one [R, sum_d] gather serves all."""
        flat = {
            _path_str(p): w
            for p, w in jax.tree_util.tree_flatten_with_path(self.params)[0]
        }
        by_key = {}
        for path, (entries, _, _) in self._build_lazy_specs().items():
            rows = flat[path].shape[0]
            by_key.setdefault((entries, rows), []).append(path)

        # NEGATIVE RESULT (round 4, measured): extending fusion to singleton
        # tables with >= 2 gather sites (behavior-sequence models: the
        # sparse bundle + each varlen history hits one item table) REGRESSED
        # both DIEN (8.15 -> 9.51 ms) and DIN (3.41 -> 4.27) — unlike the
        # main+linear case the site ids differ, so total gathered rows don't
        # shrink, and the per-occurrence compact block adds slice/unify
        # copies that cost more than the saved per-scatter overhead.  Fusion
        # therefore stays >= 2 same-layout tables (identical id patterns:
        # the combined gather halves the rows touched).
        return [
            (entries, tuple(sorted(paths)))
            for (entries, _), paths in sorted(by_key.items(), key=str)
            if len(paths) >= 2
        ]

    def _build_lazy_specs(self):
        """{table_param_path: (entries, l1, l2, lazy_init_state)} for tables
        whose touched rows the engine can enumerate from the batch (standard
        embedding_dict / linear_model layout)."""
        from .embeddings import table_touched_spec

        flat = {
            _path_str(p): w
            for p, w in jax.tree_util.tree_flatten_with_path(self.params)[0]
        }
        specs = {}
        for prefix, cols, linear in (
            ("embedding_dict", self.dnn_feature_columns, False),
            (
                "linear_model/embedding_dict",
                self.linear_feature_columns,
                True,
            ),
        ):
            try:
                spec = table_touched_spec(cols, self.schema, linear)
            except KeyError:
                continue
            for dim, entries in spec.items():
                path = f"{prefix}/table_d{dim}"
                if path in flat:
                    l1, l2 = self._reg_coeffs_for(path)
                    specs[path] = (tuple(entries), l1, l2)
        return specs

    def _sharded_lazy_path(self, table) -> bool:
        """Whether a lazy table's row update should run shard-locally under
        shard_map (active mesh with a real embed axis and divisible rows —
        the same condition ``param_sharding_rule`` row-shards it under)."""
        from .parallel.mesh import get_active_mesh

        mesh = get_active_mesh()
        return (
            mesh is not None
            and mesh.shape.get("embed", 1) > 1
            and table.shape[0] % mesh.shape["embed"] == 0
        )

    def _init_opt_state(self):
        if self._lazy_tables:
            from .optimizers import LAZY_OPTIMIZERS

            lazy_init = LAZY_OPTIMIZERS[self._lazy_kind][0]
            flat = {
                _path_str(p): w
                for p, w in jax.tree_util.tree_flatten_with_path(self.params)[0]
            }

            def make_state(path):
                state = lazy_init(flat[path])
                # embed-sharded table -> row states shard with it (same row
                # axis; per-shard moments are the pod-capacity point of the
                # lazy x sharded composition)
                if self._sharded_lazy_path(flat[path]):
                    state = jax.device_put(state, flat[path].sharding)
                return state

            self.opt_state = {
                "optax": self.optimizer.init(self.params),
                # packed-layout tables carry their row state inside the
                # param array itself — no separate state entry
                "lazy": {
                    path: make_state(path)
                    for path in self._lazy_tables
                    if path not in self._packed_tables
                },
            }
            if getattr(self, "_lazy_split", False):
                # Incremental L2-reg value tracking (gradient-split mode):
                # carry sum(w^2) per lazy table as a scalar in the optimizer
                # state, updated each step from the touched rows' before/after
                # values — this removes the last full-table read from the
                # split-mode train step.  Value-only: the reg GRADIENT is
                # applied exactly row-wise regardless; this scalar feeds the
                # logged loss (reference logs reg-in-loss, basemodel.py:254-257).
                # l1-regularized tables keep the full scan (|w| deltas don't
                # decompose as cheaply and l1 on embeddings is off by default).
                # Jitted: an eager reshape/sum on a [65M, 10] table triggers a
                # layout copy into (8,128)-tiled padding — 33 GB for 2.6 GB of
                # data — whereas inside XLA the square+reduce fuses in place.
                # Embed-sharded tables skip the tracker: their shard-local
                # update path (sharded_lazy_row_update) doesn't surface
                # before/after row values, so they fall back to the fused
                # full-table reg value (GSPMD local reduce + psum).
                sumsq = jax.jit(
                    lambda t, a, b: jnp.sum(jnp.square(t[:, a:b])),
                    static_argnums=(1, 2),
                )
                # packed members live as column slices of their group host
                view = {}
                for g in self._packed_groups:
                    arr = flat[g["host"]]
                    for m in g["members"]:
                        view[m["path"]] = (
                            arr, m["off"], m["off"] + m["dim"]
                        )
                reg = {}
                for path, (entries, l1, l2) in self._lazy_tables.items():
                    if not (l2 > 0 and l1 == 0):
                        continue
                    arr, a, b = view.get(
                        path,
                        (flat.get(path), 0, None),
                    )
                    if arr is None or self._sharded_lazy_path(arr):
                        continue
                    reg[path] = sumsq(arr, a, b if b else arr.shape[1])
                self.opt_state["reg"] = reg
        else:
            self.opt_state = self.optimizer.init(self.params)

    def _get_metrics(self, metrics):
        metrics_ = {}
        if metrics:
            for m in metrics:
                if m not in HOST_METRICS:
                    raise NotImplementedError(m)
                metrics_[m] = HOST_METRICS[m]
                self.metrics_names.append(m)
        return metrics_

    def _build_steps(self):
        module = self.module
        loss_names = self.loss_names
        metric_names = list(self.metrics.keys())
        lazy_specs = dict(self._lazy_tables)
        lazy_split = bool(lazy_specs) and getattr(self, "_lazy_split", False)
        reg_fn = lambda p: self._regularization_loss(
            p, lazy_paths=frozenset(lazy_specs), skip_lazy=lazy_split
        )
        optimizer = self.optimizer
        num_tasks = self.num_tasks
        if lazy_specs:
            from .embeddings import touched_ids
            from .optimizers import (
                LAZY_OPTIMIZERS,
                LAZY_ROW_MATH,
                _row_set,
                segment_run_sums,
            )

            from .optimizers import decode_state, encode_state

            _, lazy_row_update, _ = LAZY_OPTIMIZERS[self._lazy_kind]
            lazy_row_math, _ = LAZY_ROW_MATH[self._lazy_kind]
            lazy_lr = self._lazy_lr
            state_dtype = getattr(self, "_packed_state_dtype", None)
        fused_groups = list(getattr(self, "_fused_dense_groups", ()))
        if fused_groups:
            from .embeddings import fused_gather, touched_ids

            def build_compact(p, b):
                """Per-table occurrence blocks from ONE combined gather per
                same-layout group (see compile(fused_lookup=...))."""
                compact = {}
                for entries, paths in fused_groups:
                    ids = touched_ids(b, entries)
                    tables = tuple(_tree_get(p, path) for path in paths)
                    meta = (
                        tables[0].shape[0],
                        tuple(t.shape[1] for t in tables),
                    )
                    occ = fused_gather(meta, tables, ids)
                    o = 0
                    for path, t in zip(paths, tables):
                        compact[path] = occ[:, o : o + t.shape[1]]
                        o += t.shape[1]
                return compact

        matmul_precision = getattr(self, "_matmul_precision", None)
        packed = dict(self._packed_tables)
        packed_groups = list(self._packed_groups)

        def canonical_view(p):
            """Each packed group expanded back into its members' canonical
            [rows, dim] tables for module.apply (flax validates param
            shapes).  Dead — hence free — when every lookup consumes a
            ``_compact`` block."""
            for g in packed_groups:
                arr = _tree_get(p, g["host"])
                for m in g["members"]:
                    p = _tree_set(
                        p, m["path"],
                        arr[:, m["off"] : m["off"] + m["dim"]],
                    )
            return p

        def apply_train(params, batch_stats, batch, rng):
            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            import contextlib

            ctx = (
                jax.default_matmul_precision(matmul_precision)
                if matmul_precision
                else contextlib.nullcontext()
            )
            with ctx:
                out, mutated = module.apply(
                    variables,
                    batch,
                    training=True,
                    rngs={"dropout": rng},
                    mutable=["batch_stats"],
                )
            return out, mutated.get("batch_stats", batch_stats)

        if packed:
            _apply_train_raw = apply_train

            def apply_train(params, batch_stats, batch, rng):
                return _apply_train_raw(
                    canonical_view(params), batch_stats, batch, rng
                )

        def compute_loss(out, y, mask):
            y_pred = out["pred"]
            if isinstance(loss_names, list):
                assert num_tasks is not None and len(loss_names) == num_tasks, (
                    "the length of `loss_func` should be equal with `self.num_tasks`"
                )
                loss = sum(
                    _loss_fn_single(loss_names[i])(
                        y_pred[:, i], y[:, i], mask.reshape(-1)
                    )
                    for i in range(num_tasks)
                )
            else:
                loss = _loss_fn_single(loss_names)(
                    y_pred.reshape(-1), y.reshape(-1), mask.reshape(-1)
                )
            return loss

        def step_core(params, batch_stats, opt_state, batch, y, mask, step):
            rng = jax.random.fold_in(self._base_rng, step)
            batch = dict(batch)
            batch["labels"] = y[:, :1] if y.ndim > 1 else y[:, None]
            batch["sample_mask"] = mask.reshape(-1)

            # Gradient-split mode: cut autodiff at the lookup boundary.  For
            # each lazy table, gather the batch's PER-OCCURRENCE rows into a
            # [N, dim] block (N = total looked-up positions, in touched_ids
            # concatenation order) OUTSIDE the differentiated function and
            # make that block — not the [rows, dim] table — the differentiated
            # input.  Every model lookup is then a STATIC slice of the block
            # (EmbeddingCollection._occ_layout mirrors the concat order), so
            # the block's cotangent assembles from slice pads with no scatter,
            # and no full-table zero-init/scatter/update traffic ever runs for
            # 10M+-row tables.  The full tables stay in the variables dict
            # (flax validates their shapes) but are read inside the
            # differentiated function only for the reg VALUE below.
            reg_const = jnp.zeros(())
            lazy_ids = {}
            compact_rows = {}
            packed_rows = {}
            if lazy_split:
                tracked = opt_state.get("reg", {})
                from .parallel.sharded_embedding import maybe_sharded_take

                def reg_value(path, l1, l2, table_cols):
                    """Incrementally-tracked sum(w^2) scalar when available
                    (no table read at all — updated below from touched
                    rows); otherwise the full-scan fallback, flattened so
                    XLA fuses square+reduce in one stage."""
                    if path in tracked:
                        return l2 * tracked[path]
                    flat_t = table_cols.reshape(-1)
                    out = jnp.zeros(())
                    if l1 > 0:
                        out = out + l1 * jnp.sum(jnp.abs(flat_t))
                    if l2 > 0:
                        out = out + l2 * jnp.sum(jnp.square(flat_t))
                    return out

                # packed GROUPS: one per-occurrence walk serves every
                # member's forward block AND the whole group's optimizer
                # state (the walk is row-latency bound, not byte bound —
                # wider rows cost ~nothing, and both the per-member state
                # gathers and the per-member walks disappear)
                for g in packed_groups:
                    arr = _tree_get(params, g["host"])
                    ids = touched_ids(batch, g["entries"])
                    lazy_ids[g["host"]] = ids
                    if not self._sharded_lazy_path(arr):
                        rows_full = maybe_sharded_take(arr, ids)
                        packed_rows[g["host"]] = rows_full
                    else:
                        # embed-sharded group: the shard-local update
                        # re-gathers packed rows after the id exchange, so
                        # the forward gather ships only param columns
                        rows_full = maybe_sharded_take(
                            arr, ids, width=g["dsum"]
                        )
                    for m in g["members"]:
                        sl = slice(m["off"], m["off"] + m["dim"])
                        compact_rows[m["path"]] = rows_full[:, sl]
                        reg_const = reg_const + reg_value(
                            m["path"], m["l1"], m["l2"], arr[:, sl]
                        )
                # flat-layout lazy tables (routes through the shard_map /
                # all_to_all lookup kernels when an embedding mode is set;
                # plain take under gspmd — XLA partitions the gather)
                if not packed_groups:
                    for path, (entries, l1, l2) in lazy_specs.items():
                        table = _tree_get(params, path)
                        ids = touched_ids(batch, entries)
                        lazy_ids[path] = ids
                        compact_rows[path] = maybe_sharded_take(table, ids)
                        reg_const = reg_const + reg_value(
                            path, l1, l2, table
                        )

            def loss_fn(arg):
                p, rows_map = arg
                b = batch
                if lazy_split:
                    b = dict(batch)
                    b["_compact"] = dict(rows_map)
                elif fused_groups:
                    # dense fused lookup: one [R, sum_d] random-access walk
                    # per same-layout table group (fwd gather + bwd scatter),
                    # sliced into per-table occurrence blocks that every
                    # model lookup consumes as a static slice (the same
                    # `_compact` contract the lazy gradient-split mode uses,
                    # but differentiated: grads flow through fused_gather's
                    # combined scatter back to each table param).
                    b = dict(batch)
                    b["_compact"] = build_compact(p, batch)
                out, new_bs = apply_train(p, batch_stats, b, rng)
                loss = compute_loss(out, y, mask)
                reg = reg_fn(p) + reg_const
                aux = out.get("aux_loss", 0.0)
                total = loss + reg + aux
                return total, (loss, out, new_bs)

            (total, (loss, out, new_bs)), (grads, row_grads) = (
                jax.value_and_grad(loss_fn, has_aux=True)(
                    (params, compact_rows)
                )
            )
            if lazy_specs:
                updates, new_optax_state = optimizer.update(
                    grads, opt_state["optax"], params
                )
                new_params = optax.apply_updates(params, updates)
                new_lazy = {}
                new_reg = {}

                # ---- packed GROUPS: one update walk per group ----
                for g in packed_groups:
                    host, dsum, k_ = g["host"], g["dsum"], g["k"]
                    l1vec = np.zeros(dsum, np.float32)
                    l2vec = np.zeros(dsum, np.float32)
                    for m in g["members"]:
                        l1vec[m["off"] : m["off"] + m["dim"]] = m["l1"]
                        l2vec[m["off"] : m["off"] + m["dim"]] = m["l2"]
                    # member cotangents side by side, matching the group's
                    # param column order
                    g_all = jnp.concatenate(
                        [row_grads[m["path"]] for m in g["members"]], axis=1
                    )
                    arr = _tree_get(params, host)
                    if self._sharded_lazy_path(arr):
                        # lazy x row-sharded composition (SURVEY.md §7 M3):
                        # dedup locally, unique rows route to the owning
                        # shard, one packed gather + one scatter per shard
                        from .parallel.mesh import get_active_mesh
                        from .parallel.sharded_embedding import (
                            sharded_lazy_row_update,
                        )

                        p_new = sharded_lazy_row_update(
                            arr, None, lazy_ids[host], g_all, step + 1,
                            None, get_active_mesh(), lr=lazy_lr,
                            l1=jnp.asarray(l1vec) if l1vec.any() else 0.0,
                            l2=jnp.asarray(l2vec) if l2vec.any() else 0.0,
                            packed_dim=dsum, row_math=lazy_row_math,
                            state_mult=k_, state_dtype=state_dtype,
                        )
                        new_params = _tree_set(new_params, host, p_new)
                        continue
                    # sort by id once per group; duplicate runs get their
                    # SUM via cumsum differences so duplicates write
                    # identical values
                    ids = lazy_ids[host]
                    order = jnp.argsort(ids)
                    sids = jnp.take(ids, order)
                    is_first = jnp.concatenate(
                        [jnp.ones((1,), bool), sids[1:] != sids[:-1]]
                    )
                    g_runs = segment_run_sums(
                        jnp.take(g_all, order, axis=0), is_first
                    )
                    rows_sorted = jnp.take(
                        packed_rows[host], order, axis=0
                    )
                    p_rows = rows_sorted[:, :dsum]
                    st_rows = decode_state(
                        rows_sorted[:, dsum:], k_ * dsum, state_dtype
                    )
                    # per-member reg gradients as one column-coefficient
                    # vector (members may carry different l1/l2)
                    if l2vec.any():
                        g_runs = g_runs + 2.0 * jnp.asarray(l2vec) * p_rows
                    if l1vec.any():
                        g_runs = g_runs + jnp.asarray(l1vec) * jnp.sign(
                            p_rows
                        )
                    # pure row math + ONE combined scatter: the whole
                    # group's update is a single serialized row walk
                    p_rows_new, st_new = lazy_row_math(
                        p_rows, st_rows, g_runs, step + 1, lr=lazy_lr
                    )
                    p_new = _row_set(
                        arr, sids,
                        jnp.concatenate(
                            [p_rows_new, encode_state(st_new, state_dtype)],
                            axis=1,
                        ),
                        True,
                    )
                    new_params = _tree_set(new_params, host, p_new)
                    for m in g["members"]:
                        if m["path"] not in opt_state.get("reg", {}):
                            continue
                        # incremental sum(w^2): duplicates write identical
                        # values — count each unique row once (is_first)
                        sl = slice(m["off"], m["off"] + m["dim"])
                        delta = jnp.sum(
                            jnp.where(
                                is_first,
                                jnp.sum(jnp.square(p_rows_new[:, sl]),
                                        axis=1)
                                - jnp.sum(jnp.square(p_rows[:, sl]),
                                          axis=1),
                                0.0,
                            )
                        )
                        new_reg[m["path"]] = (
                            opt_state["reg"][m["path"]] + delta
                        )

                # ---- flat layout / dense-cotangent lazy tables ----
                for path, (entries, l1, l2) in (
                    {} if packed_groups else lazy_specs
                ).items():
                    if lazy_split and self._sharded_lazy_path(
                        _tree_get(params, path)
                    ):
                        from .parallel.mesh import get_active_mesh
                        from .parallel.sharded_embedding import (
                            sharded_lazy_row_update,
                        )

                        p_new, lstate_new = sharded_lazy_row_update(
                            _tree_get(params, path),
                            opt_state["lazy"][path], lazy_ids[path],
                            row_grads[path], step + 1, lazy_row_update,
                            get_active_mesh(), lr=lazy_lr, l1=l1, l2=l2,
                        )
                        new_params = _tree_set(new_params, path, p_new)
                        new_lazy[path] = lstate_new
                        continue
                    if lazy_split:
                        # row_grads is the per-occurrence [N, dim] cotangent:
                        # sort by id (one argsort — XLA scatters/sorts on 106k
                        # elements cost ~2 ms, see optimizers.py) and give
                        # every occurrence its duplicate-run SUM via cumsum
                        # differences; duplicates then write identical values.
                        p_arr = _tree_get(params, path)
                        ids = lazy_ids[path]
                        order = jnp.argsort(ids)
                        sids = jnp.take(ids, order)
                        g_sorted = jnp.take(row_grads[path], order, axis=0)
                        is_first = jnp.concatenate(
                            [jnp.ones((1,), bool), sids[1:] != sids[:-1]]
                        )
                        g_rows = segment_run_sums(g_sorted, is_first)
                        p_rows = jnp.take(compact_rows[path], order, axis=0)
                        ids = sids
                        ids_sorted = True
                    else:
                        p_arr = _tree_get(new_params, path)
                        ids = touched_ids(batch, entries)
                        g_rows = _tree_get(grads, path)[ids]
                        p_rows = p_arr[ids]
                        ids_sorted = False
                    if l2 > 0:
                        g_rows = g_rows + 2.0 * l2 * p_rows
                    if l1 > 0:
                        g_rows = g_rows + l1 * jnp.sign(p_rows)
                    # p_rows passes through: the rows were already gathered
                    # above (forward block / reg gradient), so the update
                    # skips its internal table walk (~117 ns/row serialized)
                    p_new, lstate_new, p_rows_new = lazy_row_update(
                        p_arr, opt_state["lazy"][path], ids, g_rows,
                        step + 1, lr=lazy_lr, sorted_ids=ids_sorted,
                        p_rows=p_rows,
                    )
                    new_params = _tree_set(new_params, path, p_new)
                    new_lazy[path] = lstate_new
                    if lazy_split and path in opt_state.get("reg", {}):
                        # incremental sum(w^2): duplicates write identical
                        # values, so count each unique row once (is_first).
                        delta = jnp.sum(
                            jnp.where(
                                is_first,
                                jnp.sum(jnp.square(p_rows_new), axis=1)
                                - jnp.sum(jnp.square(p_rows), axis=1),
                                0.0,
                            )
                        )
                        new_reg[path] = opt_state["reg"][path] + delta
                new_opt_state = {"optax": new_optax_state, "lazy": new_lazy}
                if "reg" in opt_state:
                    new_opt_state["reg"] = new_reg
            else:
                updates, new_opt_state = optimizer.update(
                    grads, opt_state, params
                )
                new_params = optax.apply_updates(params, updates)
            mvals = {}
            pred_first = out["pred"]
            if not isinstance(loss_names, list):
                pred_flat = pred_first.reshape(pred_first.shape[0], -1)[:, 0]
                for name in metric_names:
                    mvals[name] = DEVICE_METRICS[name](
                        y.reshape(y.shape[0], -1)[:, 0], pred_flat, mask.reshape(-1)
                    )
            else:
                # multitask: metrics over flattened task outputs, like the
                # reference's sklearn call on the [B, T] arrays.
                for name in metric_names:
                    mvals[name] = DEVICE_METRICS[name](
                        y.reshape(-1),
                        pred_first.reshape(-1),
                        jnp.repeat(mask.reshape(-1), pred_first.shape[-1]),
                    )
            # extra scalar logs published by the module (e.g. sfg_loss,
            # mirroring basemodel_sfg.py:366-367)
            for k, v in out.get("logs", {}).items():
                mvals["log:" + k] = v
            return new_params, new_bs, new_opt_state, total, loss, mvals

        def train_step_multi(params, batch_stats, opt_state, batches, ys,
                             masks, step0):
            """K chained train steps in ONE XLA program (lax.scan) —
            amortizes per-dispatch overhead (~1.7 ms/step over the device
            link at criteo shapes)."""
            K = ys.shape[0]

            def body(carry, xs):
                params, bs, opt = carry
                batch, y, mask, i = xs
                params, bs, opt, total, loss, mvals = step_core(
                    params, bs, opt, batch, y, mask, i
                )
                return (params, bs, opt), (total, mvals)

            steps = step0 + jnp.arange(K)
            (params, batch_stats, opt_state), (totals, mvals) = jax.lax.scan(
                body, (params, batch_stats, opt_state),
                (batches, ys, masks, steps),
            )
            return params, batch_stats, opt_state, totals, mvals

        def predict_step(params, batch_stats, batch):
            if packed_groups:
                # packed layout: serve lookups from per-occurrence compact
                # blocks (one gather per GROUP + param-column slices) and
                # hand apply the canonical table view — which is then dead,
                # so no sliced full-table copy ever materializes at serving
                # time
                batch = dict(batch)
                compact = {}
                for g in packed_groups:
                    rows = jnp.take(
                        _tree_get(params, g["host"]),
                        touched_ids(batch, g["entries"]),
                        axis=0,
                    )
                    for m in g["members"]:
                        compact[m["path"]] = rows[
                            :, m["off"] : m["off"] + m["dim"]
                        ]
                batch["_compact"] = compact
                params = canonical_view(params)
            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            if fused_groups:
                batch = dict(batch)
                batch["_compact"] = build_compact(params, batch)
            out = module.apply(variables, batch, training=False)
            return out["pred"]

        def predict_step_multi(params, batch_stats, batches):
            # K inference batches per dispatch (lax.map == scan)
            return jax.lax.map(
                lambda b: predict_step(params, batch_stats, b), batches
            )

        self._train_step = jax.jit(step_core, donate_argnums=(0, 1, 2))
        self._train_step_multi = jax.jit(
            train_step_multi, donate_argnums=(0, 1, 2)
        )
        self._predict_step = jax.jit(predict_step)
        self._predict_step_multi = jax.jit(predict_step_multi)
        self._compiled = True

    # ------------------------------------------------------------------ fit

    def _pack_x(self, x):
        if isinstance(x, dict):
            return self.schema.pack(x)
        if isinstance(x, (list, tuple)):
            names = self.schema.feature_names()
            return self.schema.pack(dict(zip(names, x)))
        raise TypeError("x must be a dict or list of arrays")

    def fit(
        self,
        x=None,
        y=None,
        batch_size=None,
        epochs=1,
        verbose=1,
        initial_epoch=0,
        validation_split=0.0,
        validation_data=None,
        shuffle=True,
        callbacks=None,
        steps_per_dispatch=1,
    ):
        assert self._compiled, "call compile() before fit()"
        batch = self._pack_x(x)
        y = np.asarray(y, dtype=np.float32)
        if y.ndim == 1:
            y = y[:, None]
        n = len(y)

        do_validation = False
        if validation_data:
            do_validation = True
            if len(validation_data) == 2:
                val_x, val_y = validation_data
            elif len(validation_data) == 3:
                val_x, val_y, _ = validation_data
            else:
                raise ValueError(
                    "When passing a `validation_data` argument, it must contain "
                    "either 2 items (x_val, y_val), or 3 items "
                    "(x_val, y_val, val_sample_weights)"
                )
            val_batch = self._pack_x(val_x)
            val_y = np.asarray(val_y, dtype=np.float32)
        elif validation_split and 0.0 < validation_split < 1.0:
            do_validation = True
            split_at = int(n * (1.0 - validation_split))
            val_batch = self.schema.slice_batch(batch, split_at, n)
            val_y = y[split_at:]
            batch = self.schema.slice_batch(batch, 0, split_at)
            y = y[:split_at]
            n = split_at
        else:
            val_batch, val_y = None, []

        if batch_size is None:
            batch_size = 256
        steps_per_epoch = (n - 1) // batch_size + 1

        callbacks = CallbackList((callbacks or []) + [self.history])
        callbacks.set_model(self)
        callbacks.set_params({
            "batch_size": batch_size, "epochs": epochs,
            "steps": steps_per_epoch, "samples": n, "verbose": verbose,
            "do_validation": do_validation, "metrics": self.metrics_names,
        })
        callbacks.on_train_begin()
        self.stop_training = False

        print(
            "Train on {0} samples, validate on {1} samples, {2} steps per "
            "epoch".format(n, len(val_y), steps_per_epoch)
        )
        rng = np.random.default_rng(self.seed)
        global_step = 0
        for epoch in range(initial_epoch, epochs):
            callbacks.on_epoch_begin(epoch)
            epoch_logs = {}
            start_time = time.time()
            total_loss_epoch = 0.0
            train_result: Dict[str, List[float]] = {}
            perm = rng.permutation(n) if shuffle else np.arange(n)
            pending = []  # (totals, mvals) device values, sync at epoch end

            def make_batch(i):
                idx = perm[i * batch_size : (i + 1) * batch_size]
                bs = len(idx)
                mask = np.ones((batch_size,), np.float32)
                if bs < batch_size:
                    pad = batch_size - bs
                    idx = np.concatenate([idx, np.zeros(pad, np.int64)])
                    mask[bs:] = 0.0
                return (
                    {k: v[idx] for k, v in batch.items()},
                    y[idx],
                    mask,
                )

            i = 0
            while i < steps_per_epoch:
                k_steps = min(steps_per_dispatch, steps_per_epoch - i)
                if k_steps > 1:
                    parts = [make_batch(i + j) for j in range(k_steps)]
                    xb = {
                        key: jnp.asarray(np.stack([p[0][key] for p in parts]))
                        for key in batch
                    }
                    yb = jnp.asarray(np.stack([p[1] for p in parts]))
                    mb = jnp.asarray(np.stack([p[2] for p in parts]))
                    (
                        self.params,
                        self.batch_stats,
                        self.opt_state,
                        totals,
                        mvals,
                    ) = self._train_step_multi(
                        self.params, self.batch_stats, self.opt_state,
                        xb, yb, mb, global_step,
                    )
                else:
                    xb, yb, mask = make_batch(i)
                    xb = {k: jnp.asarray(v) for k, v in xb.items()}
                    (
                        self.params,
                        self.batch_stats,
                        self.opt_state,
                        totals,
                        loss,
                        mvals,
                    ) = self._train_step(
                        self.params, self.batch_stats, self.opt_state,
                        xb, jnp.asarray(yb), jnp.asarray(mask), global_step,
                    )
                pending.append(
                    (
                        totals,
                        mvals
                        if verbose > 0
                        else {
                            k: v for k, v in mvals.items() if k.startswith("log:")
                        },
                    )
                )
                global_step += k_steps
                i += k_steps
            # single host sync point per epoch
            for totals, mvals in pending:
                total_loss_epoch += float(np.sum(np.asarray(totals)))
                for name, v in mvals.items():
                    train_result.setdefault(name, []).extend(
                        np.atleast_1d(np.asarray(v)).tolist()
                    )

            epoch_logs["loss"] = total_loss_epoch / n
            for name, result in train_result.items():
                key = name[4:] if name.startswith("log:") else name
                epoch_logs[key] = float(np.sum(result) / steps_per_epoch)

            if do_validation:
                eval_result = self._evaluate_packed(val_batch, val_y, batch_size)
                for name, result in eval_result.items():
                    epoch_logs["val_" + name] = result

            if verbose > 0:
                epoch_time = int(time.time() - start_time)
                print("Epoch {0}/{1}".format(epoch + 1, epochs))
                eval_str = "{0}s - loss: {1: .4f}".format(
                    epoch_time, epoch_logs["loss"]
                )
                for name in self.metrics:
                    eval_str += " - " + name + ": {0: .4f}".format(epoch_logs[name])
                if do_validation:
                    for name in self.metrics:
                        eval_str += " - val_" + name + ": {0: .4f}".format(
                            epoch_logs["val_" + name]
                        )
                print(eval_str)
            callbacks.on_epoch_end(epoch, epoch_logs)
            if self.stop_training:
                break
        callbacks.on_train_end()
        return self.history

    @staticmethod
    def _prefetch_iter(it, depth=3):
        """Pull `it` in a background thread (queue depth bounded) so host-side
        batch production — file parse, preprocessing — overlaps device steps.
        Parsing releases the GIL in the native path (ctypes) and in numpy, so
        a plain thread captures most of the overlap."""
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=depth)
        END = object()
        stop = threading.Event()

        def put(item):
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for item in it:
                    if not put(item):
                        return
                put(END)
            except BaseException as e:  # propagate into the consumer
                put(e)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is END:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()

    def fit_stream(
        self,
        generator,
        epochs=1,
        verbose=1,
        initial_epoch=0,
        validation_data=None,
        callbacks=None,
        steps_per_dispatch=1,
        steps_per_epoch=None,
        prefetch=3,
    ):
        """Out-of-core training from a batch stream.

        The reference (and :meth:`fit`) materializes the whole dataset in host
        memory (``basemodel.py:155-198`` builds one ``[N, W]`` matrix); this
        streams instead: ``generator`` yields ``(x, y)`` batches — ``x`` a
        feature dict, ``y`` labels — of a fixed batch size (the final batch
        may be shorter; it is padded + masked like fit's tail batch).  Pair
        with :func:`data.iter_criteo_batches` to train on files larger than
        host RAM.

        ``generator`` may be a callable ``epoch -> iterable`` (fresh stream
        per epoch) or a re-iterable; a bare one-shot iterator only supports
        ``epochs=1``.  Epoch logs, callbacks, sum-loss normalization, and the
        train-metric semantics match :meth:`fit` exactly.  ``steps_per_epoch``
        optionally caps (or sizes the log line for) each epoch; by default an
        epoch is one full pass of the stream.
        """
        assert self._compiled, "call compile() before fit_stream()"
        do_validation = bool(validation_data)
        if do_validation:
            val_x, val_y = validation_data[0], validation_data[1]
            val_batch = self._pack_x(val_x)
            val_y = np.asarray(val_y, dtype=np.float32)

        callbacks = CallbackList((callbacks or []) + [self.history])
        callbacks.set_model(self)
        callbacks.set_params({
            "epochs": epochs, "verbose": verbose,
            # keras convention: steps present but None when the stream
            # length is unknown up front
            "steps": steps_per_epoch,
            "do_validation": do_validation, "metrics": self.metrics_names,
        })
        callbacks.on_train_begin()
        self.stop_training = False
        if verbose > 0:
            print(
                "Train on stream, validate on {0} samples".format(
                    len(val_y) if do_validation else 0
                )
            )

        batch_size = None
        global_step = 0
        for epoch in range(initial_epoch, epochs):
            callbacks.on_epoch_begin(epoch)
            epoch_logs = {}
            start_time = time.time()
            total_loss_epoch = 0.0
            n_seen = 0
            n_steps = 0
            train_result: Dict[str, List[float]] = {}
            pending = []  # (totals, mvals) device values, sync at epoch end
            group = []  # buffered (xb, yb, mask) for multi-step dispatch

            def prep(xy):
                nonlocal batch_size, n_seen
                x, yb = xy
                xb = self._pack_x(x)
                yb = np.asarray(yb, dtype=np.float32)
                if yb.ndim == 1:
                    yb = yb[:, None]
                bs = len(yb)
                if batch_size is None:
                    batch_size = bs
                if bs > batch_size:
                    raise ValueError(
                        f"stream batch of {bs} rows exceeds the stream's "
                        f"batch size {batch_size}"
                    )
                n_seen += bs
                mask = np.ones((batch_size,), np.float32)
                if bs < batch_size:
                    pad = batch_size - bs
                    mask[bs:] = 0.0
                    xb = {
                        k: np.concatenate(
                            [v, np.repeat(v[-1:], pad, axis=0)]
                        )
                        for k, v in xb.items()
                    }
                    yb = np.concatenate(
                        [yb, np.zeros((pad,) + yb.shape[1:], yb.dtype)]
                    )
                return xb, yb, mask

            def dispatch(group):
                nonlocal global_step, n_steps
                if len(group) == 1:
                    xb, yb, mask = group[0]
                    xb = {k: jnp.asarray(v) for k, v in xb.items()}
                    (
                        self.params, self.batch_stats, self.opt_state,
                        totals, loss, mvals,
                    ) = self._train_step(
                        self.params, self.batch_stats, self.opt_state,
                        xb, jnp.asarray(yb), jnp.asarray(mask), global_step,
                    )
                else:
                    xb = {
                        key: jnp.asarray(
                            np.stack([g[0][key] for g in group])
                        )
                        for key in group[0][0]
                    }
                    yb = jnp.asarray(np.stack([g[1] for g in group]))
                    mb = jnp.asarray(np.stack([g[2] for g in group]))
                    (
                        self.params, self.batch_stats, self.opt_state,
                        totals, mvals,
                    ) = self._train_step_multi(
                        self.params, self.batch_stats, self.opt_state,
                        xb, yb, mb, global_step,
                    )
                pending.append(
                    (
                        totals,
                        mvals
                        if verbose > 0
                        else {
                            k: v
                            for k, v in mvals.items()
                            if k.startswith("log:")
                        },
                    )
                )
                global_step += len(group)
                n_steps += len(group)

            stream = generator(epoch) if callable(generator) else generator
            if prefetch:
                src = iter(stream)
                if steps_per_epoch:
                    # bound read-ahead so the source is consumed exactly
                    # steps_per_epoch times, as without prefetch
                    import itertools

                    src = itertools.islice(src, steps_per_epoch)
                stream = self._prefetch_iter(src, depth=prefetch)
            for xy in stream:
                group.append(prep(xy))
                if len(group) == steps_per_dispatch:
                    dispatch(group)
                    group = []
                if steps_per_epoch and n_steps + len(group) >= steps_per_epoch:
                    break
            if group:
                dispatch(group)

            for totals, mvals in pending:
                total_loss_epoch += float(np.sum(np.asarray(totals)))
                for name, v in mvals.items():
                    train_result.setdefault(name, []).extend(
                        np.atleast_1d(np.asarray(v)).tolist()
                    )

            epoch_logs["loss"] = (
                total_loss_epoch / n_seen if n_seen else float("nan")
            )
            for name, result in train_result.items():
                key = name[4:] if name.startswith("log:") else name
                epoch_logs[key] = float(np.sum(result) / max(n_steps, 1))

            if do_validation:
                eval_result = self._evaluate_packed(
                    val_batch, val_y, batch_size or 256
                )
                for name, result in eval_result.items():
                    epoch_logs["val_" + name] = result

            if verbose > 0:
                epoch_time = int(time.time() - start_time)
                print("Epoch {0}/{1}".format(epoch + 1, epochs))
                eval_str = "{0}s - {1} samples - loss: {2: .4f}".format(
                    epoch_time, n_seen, epoch_logs["loss"]
                )
                for name in self.metrics:
                    eval_str += " - " + name + ": {0: .4f}".format(
                        epoch_logs[name]
                    )
                if do_validation:
                    for name in self.metrics:
                        eval_str += " - val_" + name + ": {0: .4f}".format(
                            epoch_logs["val_" + name]
                        )
                print(eval_str)
            callbacks.on_epoch_end(epoch, epoch_logs)
            if self.stop_training:
                break
        callbacks.on_train_end()
        return self.history

    # ------------------------------------------------------ evaluate/predict

    def evaluate(self, x, y, batch_size=256):
        return self._evaluate_packed(self._pack_x(x), np.asarray(y), batch_size)

    def _evaluate_packed(self, batch, y, batch_size=256):
        pred = self._predict_packed(batch, batch_size)
        return {
            name: fn(np.asarray(y).reshape(pred.shape), pred)
            for name, fn in self.metrics.items()
        }

    def predict(self, x, batch_size=256):
        return self._predict_packed(self._pack_x(x), batch_size)

    def _predict_packed(self, batch, batch_size=256, batches_per_dispatch=8):
        n = len(next(iter(batch.values())))
        n_batches = (n - 1) // batch_size + 1 if n else 0
        # pad the flat arrays once to n_batches*batch_size rows
        n_pad = n_batches * batch_size - n
        if n_pad:
            batch = {
                k: np.concatenate([v, np.repeat(v[-1:], n_pad, axis=0)])
                for k, v in batch.items()
            }
        preds = []
        i = 0
        while i < n_batches:
            k_b = min(batches_per_dispatch, n_batches - i)
            if k_b > 1:
                xb = {
                    key: jnp.asarray(
                        v[i * batch_size : (i + k_b) * batch_size].reshape(
                            (k_b, batch_size) + v.shape[1:]
                        )
                    )
                    for key, v in batch.items()
                }
                out = self._predict_step_multi(self.params, self.batch_stats, xb)
                preds.append(np.asarray(out).reshape(k_b * batch_size, -1))
            else:
                xb = {
                    key: jnp.asarray(v[i * batch_size : (i + 1) * batch_size])
                    for key, v in batch.items()
                }
                out = self._predict_step(self.params, self.batch_stats, xb)
                preds.append(np.asarray(out))
            i += k_b
        if not preds:
            return np.zeros((0, 1), dtype="float64")
        return np.concatenate(preds)[:n].astype("float64")

    # --------------------------------------------------------- weights I/O

    def get_weights(self):
        """Always the CANONICAL format: packed lazy tables are sliced back
        to [rows, dim] (see compile(embedding_layout=...))."""
        return {
            "params": jax.tree.map(
                np.asarray, self._canonical_params(self.params)
            ),
            "batch_stats": jax.tree.map(np.asarray, self.batch_stats),
        }

    def set_weights(self, weights):
        """Accepts canonical-format weights; on a packed model each group
        reassembles from the members' param columns while the in-array
        optimizer row state is preserved (matching the flat layout, where
        set_weights leaves opt_state untouched)."""
        params = jax.tree.map(jnp.asarray, weights["params"])
        for g in self._packed_groups:
            cur = _tree_get(self.params, g["host"])
            parts = [_tree_get(params, m["path"]) for m in g["members"]]
            arr = jnp.concatenate(parts + [cur[:, g["dsum"] :]], axis=1)
            for m in g["members"][1:]:
                params = _tree_del(params, m["path"])
            params = _tree_set(params, g["host"], arr)
        self.params = params
        self.batch_stats = jax.tree.map(jnp.asarray, weights["batch_stats"])

    def save_weights(self, path):
        data = flax.serialization.to_bytes(self.get_weights())
        with open(path, "wb") as f:
            f.write(data)

    def load_weights(self, path):
        with open(path, "rb") as f:
            data = f.read()
        try:
            weights = flax.serialization.from_bytes(self.get_weights(), data)
        except Exception:
            # only fall back for actual full-checkpoint files
            # (ModelCheckpoint's default save_weights_only=False writes
            # params + optimizer state); anything else — e.g. a weights file
            # from a different architecture — must surface its real error,
            # not get installed unvalidated.  Restoring against a template
            # built from the LIVE model validates tree structure and shapes
            # here instead of deferring the failure to apply time.
            state = flax.serialization.msgpack_restore(data)
            if "opt_state" not in state or "params" not in state:
                raise
            template = {
                "params": jax.tree.map(np.asarray, self.params),
                "batch_stats": jax.tree.map(np.asarray, self.batch_stats)
                if state.get("batch_stats")
                else {},
            }
            checked = flax.serialization.from_state_dict(
                template,
                {
                    "params": state["params"],
                    "batch_stats": state.get("batch_stats") or {},
                },
            )
            for (pa, a), (pb, b) in zip(
                jax.tree_util.tree_flatten_with_path(template)[0],
                jax.tree_util.tree_flatten_with_path(checked)[0],
            ):
                if pa != pb or np.shape(a) != np.shape(b):
                    raise ValueError(
                        f"checkpoint does not match this architecture at "
                        f"{_path_str(pa)}: expected {np.shape(a)}, got "
                        f"{np.shape(b)}"
                    )
            weights = checked
        self.set_weights(weights)

    def _canonical_opt_state(self):
        """opt_state in the canonical on-disk format: a packed group's
        in-array row state is surfaced per member as
        ``opt_state['lazy'][path]`` ([rows, k*dim]), exactly as the flat
        layout stores it — so checkpoints are byte-compatible across
        embedding_layout settings."""
        from .optimizers import decode_state

        opt = self.opt_state
        if not self._packed_groups or not isinstance(opt, dict):
            return opt
        lazy = dict(opt.get("lazy", {}))
        for g in self._packed_groups:
            st_all = decode_state(
                _tree_get(self.params, g["host"])[:, g["dsum"] :],
                g["k"] * g["dsum"],
                self._packed_state_dtype,
            )
            for m in g["members"]:
                lazy[m["path"]] = self._member_state_slice(st_all, g, m)
        return {**opt, "lazy": lazy}

    def save_checkpoint(self, path, epoch=0):
        """Full training checkpoint: params + batch_stats + OPTIMIZER STATE +
        epoch.  The reference never persists optimizer state
        (SURVEY.md §5 checkpoint/resume); this enables true resume via
        ``fit(initial_epoch=...)``.  Always written in the CANONICAL format
        (table_d{d} [rows, dim] + opt_state['lazy'] row states), whatever
        the live embedding_layout."""
        assert self._compiled, "compile() before save_checkpoint()"
        state = {
            "params": jax.tree.map(
                np.asarray, self._canonical_params(self.params)
            ),
            "batch_stats": jax.tree.map(np.asarray, self.batch_stats),
            "opt_state": jax.tree.map(np.asarray, self._canonical_opt_state()),
            "epoch": epoch,
        }
        with open(path, "wb") as f:
            f.write(flax.serialization.to_bytes(state))

    @staticmethod
    def _merge_state_dict(template_sd, saved_sd):
        """Copy every leaf of ``saved_sd`` into the matching key of
        ``template_sd``; template keys absent from the save keep their live
        value.  Used for the optax subtree only: a packed model's params
        tree omits fused member paths, so its optax MASK structure
        (MaskedNode placeholders, no content) differs from the flat
        layout's — but every real leaf (dense mu/nu, step counts) matches
        by key across layouts."""
        if not isinstance(template_sd, dict):
            return saved_sd
        out = dict(template_sd)
        for key, tval in template_sd.items():
            if isinstance(saved_sd, dict) and key in saved_sd:
                out[key] = BaseModel._merge_state_dict(tval, saved_sd[key])
        return out

    def load_checkpoint(self, path):
        assert self._compiled, "compile() before load_checkpoint()"
        canonical_opt = self._canonical_opt_state()
        with open(path, "rb") as f:
            raw = flax.serialization.msgpack_restore(f.read())
        params = flax.serialization.from_state_dict(
            jax.tree.map(np.asarray, self._canonical_params(self.params)),
            raw["params"],
        )
        batch_stats = flax.serialization.from_state_dict(
            jax.tree.map(np.asarray, self.batch_stats), raw["batch_stats"]
        )
        if isinstance(canonical_opt, dict):
            # 'lazy'/'reg' are canonical per-member dicts (strict restore);
            # 'optax' restores leniently — its masked structure differs
            # across embedding layouts while every REAL leaf matches by key
            raw_opt = raw["opt_state"]
            opt = {
                key: flax.serialization.from_state_dict(
                    jax.tree.map(np.asarray, val), raw_opt[key]
                )
                for key, val in canonical_opt.items()
                if key != "optax"
            }
            optax_live = canonical_opt["optax"]
            merged = self._merge_state_dict(
                flax.serialization.to_state_dict(
                    jax.tree.map(np.asarray, optax_live)
                ),
                raw_opt.get("optax", {}),
            )
            opt["optax"] = flax.serialization.from_state_dict(
                optax_live, merged
            )
        else:
            opt = flax.serialization.from_state_dict(
                jax.tree.map(np.asarray, canonical_opt), raw["opt_state"]
            )
        state = {"epoch": raw["epoch"]}
        if self._packed_groups:
            # reassemble the packed group layout from the canonical (fp32)
            # checkpoint — HOST-side for the fp32 layout (from_bytes
            # returns numpy; the device never holds table + state + packed
            # result at once at capacity); bf16 state re-encodes on device
            from .optimizers import encode_state

            dt = self._packed_state_dtype
            lazy = dict(opt["lazy"])
            for g in self._packed_groups:
                R, k, dsum = g["rows"], g["k"], g["dsum"]
                tables = [
                    np.asarray(_tree_get(params, m["path"]))
                    for m in g["members"]
                ]
                # member states [R, k*dim] interleave back into the group
                # state layout (k stacked dsum-wide blocks)
                st_all = np.concatenate(
                    [
                        np.asarray(lazy.pop(m["path"])).reshape(
                            R, k, m["dim"]
                        )
                        for m in g["members"]
                    ],
                    axis=2,
                ).reshape(R, k * dsum)
                if jnp.dtype(dt) == jnp.dtype(jnp.bfloat16):
                    st_all = np.asarray(
                        encode_state(jnp.asarray(st_all), dt)
                    )
                arr = np.concatenate(tables + [st_all], axis=1)
                for m in g["members"][1:]:
                    params = _tree_del(params, m["path"])
                params = _tree_set(params, g["host"], arr)
            opt = {**opt, "lazy": lazy}
        self.params = jax.tree.map(jnp.asarray, params)
        self.batch_stats = jax.tree.map(jnp.asarray, batch_stats)
        self.opt_state = jax.tree.map(jnp.asarray, opt)
        return int(state["epoch"])

    # ------------------------------------------------- sharded checkpoints

    def save_checkpoint_sharded(self, path, epoch=0, block=True):
        """Orbax/tensorstore checkpoint that writes each array SHARD from
        the devices that hold it — no host gather, no single-host staging
        of a 100M-row table (the flax-serialization
        :meth:`save_checkpoint` assembles everything on one host, which is
        the right portable format but the wrong mechanics at pod scale).

        Saves the LIVE representation (including the packed param|state
        layout and its shardings); restore into an identically-configured
        and identically-sharded model via :meth:`load_checkpoint_sharded`.
        For cross-layout / cross-topology portability use the canonical
        :meth:`save_checkpoint` instead.  SURVEY.md §5 (checkpoint/resume:
        "Orbax-style checkpoint of params + optimizer state").

        ``block=False`` returns as soon as the device arrays are snapshot
        (orbax async): training steps continue while tensorstore writes in
        the background — call :meth:`wait_for_checkpoints` (or save again /
        exit) to join.  The snapshot is consistent even though the live
        arrays keep updating."""
        assert self._compiled, "compile() before save_checkpoint_sharded()"
        import os

        import orbax.checkpoint as ocp

        state = {
            "params": self.params,
            "batch_stats": self.batch_stats,
            "opt_state": self.opt_state,
            "epoch": jnp.asarray(epoch, jnp.int32),
        }
        ckptr = getattr(self, "_async_ckptr", None)
        if ckptr is None:
            ckptr = self._async_ckptr = ocp.AsyncCheckpointer(
                ocp.StandardCheckpointHandler()
            )
        ckptr.save(
            os.path.abspath(path), args=ocp.args.StandardSave(state),
            force=True,
        )
        if block:
            ckptr.wait_until_finished()

    def wait_for_checkpoints(self):
        """Join any in-flight ``save_checkpoint_sharded(block=False)``."""
        ckptr = getattr(self, "_async_ckptr", None)
        if ckptr is not None:
            ckptr.wait_until_finished()

    def load_checkpoint_sharded(self, path):
        """Restore a :meth:`save_checkpoint_sharded` checkpoint directly
        into the live model's shardings — each host/device reads only its
        own shards.  Returns the saved epoch."""
        assert self._compiled, "compile() before load_checkpoint_sharded()"
        import os

        import orbax.checkpoint as ocp

        state = {
            "params": self.params,
            "batch_stats": self.batch_stats,
            "opt_state": self.opt_state,
            "epoch": jnp.asarray(0, jnp.int32),
        }

        from .parallel.mesh import get_active_mesh

        mesh = get_active_mesh()

        def as_abstract(x):
            if hasattr(x, "shape") and hasattr(x, "dtype"):
                sharding = getattr(x, "sharding", None)
                if mesh is not None and (
                    sharding is None
                    or getattr(sharding, "device_set", None)
                    != set(mesh.devices.flat)
                ):
                    # a freshly-initialized leaf (e.g. optax's step counter)
                    # may sit on one device while the model state spans the
                    # mesh — restore it REPLICATED so the train step sees
                    # one consistent device set
                    from jax.sharding import (
                        NamedSharding,
                        PartitionSpec as P,
                    )

                    sharding = NamedSharding(mesh, P())
                return jax.ShapeDtypeStruct(
                    x.shape, x.dtype, sharding=sharding
                )
            return x

        abstract = jax.tree.map(as_abstract, state)
        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(os.path.abspath(path), abstract)
        self.params = restored["params"]
        self.batch_stats = restored["batch_stats"]
        self.opt_state = restored["opt_state"]
        return int(restored["epoch"])

    # ----------------------------------------------------------- misc parity

    @property
    def embedding_size(self):
        from .features import SparseFeat, VarLenSparseFeat

        feats = [
            f
            for f in self.dnn_feature_columns
            if isinstance(f, (SparseFeat, VarLenSparseFeat))
        ]
        sizes = set(f.embedding_dim for f in feats)
        if len(sizes) > 1:
            raise ValueError(
                "embedding_dim of SparseFeat and VarlenSparseFeat must be same "
                "in this model!"
            )
        return list(sizes)[0]

    def compute_input_dim(
        self,
        feature_columns,
        include_sparse=True,
        include_dense=True,
        feature_group=False,
    ):
        from .features import compute_input_dim

        return compute_input_dim(
            feature_columns, include_sparse, include_dense, feature_group
        )

"""xDeepFM-Pro: xDeepFM + SFG + optional AutoDis
(reference: ``deepctr/xdeepfm_pro/xdeepfm_pro.py:31-393``,
``basemodel_sfg.py:96-677``).

The reference forks the whole BaseModel into BaseModelSFG; here the generic
engine already supports label-conditioned aux losses (labels/sample_mask in the
train batch, module-published logs), so xDeepFMPro is just a module + weights.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..basemodel import BaseModel
from ..embeddings import EmbeddingCollection, LinearModel
from ..features import (
    DenseFeat,
    FeatureSchema,
    SparseFeat,
    compute_input_dim,
    split_columns,
)
from ..nn.core import DNN, PredictionLayer, torch_linear_init
from ..nn.interaction import CIN
from .autodis import DenseFeatureEncoder
from .sfg import SFGDecoder, sfg_loss, sfg_loss_rows


class XDeepFMProModule(nn.Module):
    linear_cols: tuple
    dnn_cols: tuple
    schema: FeatureSchema
    embedding_dim: int
    dnn_hidden_units: Tuple[int, ...] = (256, 256)
    cin_layer_size: Tuple[int, ...] = (256, 128)
    cin_split_half: bool = True
    cin_activation: str = "relu"
    l2_reg_cin: float = 0.0
    init_std: float = 1e-4
    seed: int = 1024
    dnn_dropout: float = 0.0
    dnn_activation: str = "relu"
    dnn_use_bn: bool = False
    task: str = "binary"
    # SFG
    use_sfg: bool = True
    sfg_weight: float = 0.1
    sfg_hidden_units: Tuple[int, ...] = (128, 64)
    sfg_dropout: float = 0.1
    sfg_positive_only: bool = True
    sfg_use_label_attention: bool = True
    # 'auto': the flash-CE Pallas kernel (``ops/ce_pallas.py`` — logit blocks
    # VMEM-only, online logsumexp, blockwise gradients) on single-chip TPU;
    # elsewhere, remat-fused heads+CE when the materialized per-step logits
    # (B * sum(vocab) fp32) would crowd HBM (>8 GB — remat measured ~25%
    # SLOWER at bench shapes, 38.2 -> 48.4 ms, but is the only XLA path that
    # FITS at production vocab sizes: B=4096 x 26 x 1M-vocab heads would
    # materialize >400 GB).  'pallas' / True (remat) / False force a path.
    sfg_fused_ce: object = "auto"
    # AutoDis
    use_autodis: bool = False
    autodis_buckets: int = 16
    autodis_temperature: float = 1.0

    def setup(self):
        self.embedding_dict = EmbeddingCollection(
            feature_columns=self.dnn_cols, schema=self.schema,
            init_std=self.init_std, name="embedding_dict",
        )
        self.linear_model = LinearModel(
            feature_columns=self.linear_cols, schema=self.schema,
            init_std=self.init_std, name="linear_model",
        )
        sp, de, vl = split_columns(self.dnn_cols)
        self._sparse_cols = tuple(sp)
        self._dense_cols = tuple(de)
        self.use_dnn = len(self.dnn_cols) > 0 and len(self.dnn_hidden_units) > 0
        self.use_cin = len(self.cin_layer_size) > 0 and len(self.dnn_cols) > 0

        dense_dim = sum(f.dimension for f in de)
        if self.use_autodis and any(f.dimension != 1 for f in de):
            raise ValueError(
                "AutoDis bucketizes SCALAR dense features; DenseFeat with "
                "dimension > 1 is not supported with use_autodis=True "
                "(reference autodis.py has the same per-value assumption)"
            )
        if self.use_autodis and len(de) > 0:
            self.autodis_encoder = DenseFeatureEncoder(
                num_features=len(de),
                embedding_dim=self.embedding_dim,
                use_autodis=True,
                num_buckets=self.autodis_buckets,
                temperature=self.autodis_temperature,
                name="autodis_encoder",
            )
            autodis_dim = self.autodis_encoder.get_output_dim()
        else:
            autodis_dim = 0

        if self.use_dnn:
            base = compute_input_dim(self.dnn_cols)
            if self.use_autodis and autodis_dim > 0:
                dnn_input_dim = base - dense_dim + autodis_dim
            else:
                dnn_input_dim = base
            self.dnn = DNN(
                inputs_dim=dnn_input_dim,
                hidden_units=self.dnn_hidden_units,
                activation=self.dnn_activation,
                dropout_rate=self.dnn_dropout,
                use_bn=self.dnn_use_bn,
                init_std=self.init_std,
                name="dnn",
            )
            self.dnn_linear = nn.Dense(
                1, use_bias=False, kernel_init=torch_linear_init,
                name="dnn_linear",
            )
        if self.use_cin:
            field_num = len(sp) + len(vl)
            self.cin = CIN(
                field_size=field_num,
                layer_size=self.cin_layer_size,
                activation=self.cin_activation,
                split_half=self.cin_split_half,
                l2_reg=self.l2_reg_cin,
                seed=self.seed,
                name="cin",
            )
            self.cin_linear = nn.Dense(
                1, use_bias=False, kernel_init=torch_linear_init,
                name="cin_linear",
            )
        if (self.use_cin or self.use_sfg) and len(sp) + len(vl) == 0:
            raise ValueError(
                "xDeepFMPro needs at least one sparse/varlen feature in "
                "dnn_feature_columns: CIN and the SFG decoder operate on "
                "the embedding stack"
            )
        if self.use_sfg:
            self.sfg_decoder = SFGDecoder(
                embedding_dim=self.embedding_dim,
                sparse_vocab_sizes=tuple(
                    (f.name, f.vocabulary_size) for f in sp
                ),
                # dense WIDTH (the regression head reconstructs every dense
                # component) and the FULL field count (the decoder input
                # stack includes varlen-pooled embeddings)
                num_dense=dense_dim,
                num_fields=len(sp) + len(vl),
                hidden_units=self.sfg_hidden_units,
                dropout_rate=self.sfg_dropout,
                use_label_aware_attention=self.sfg_use_label_attention,
                name="sfg_decoder",
            )
        self.out = PredictionLayer(task=self.task, name="out")

    def __call__(self, batch, training: bool = False):
        sparse_stack, dense_vals = self.embedding_dict.stacked_inputs(
            batch, self.dnn_cols
        )
        final_logit = self.linear_model(batch)
        if self.use_cin:
            cin_output = self.cin(sparse_stack, training=training)
            final_logit = final_logit + self.cin_linear(cin_output)
        if self.use_dnn:
            parts = [sparse_stack.reshape(sparse_stack.shape[0], -1)]
            if dense_vals is not None:
                if self.use_autodis and len(self._dense_cols) > 0:
                    autodis_flat, _, _ = self.autodis_encoder(dense_vals)
                    parts.append(autodis_flat)
                else:
                    parts.append(dense_vals)
            dnn_out = self.dnn(jnp.concatenate(parts, axis=-1), training=training)
            final_logit = final_logit + self.dnn_linear(dnn_out)

        out = {"pred": self.out(final_logit)}

        labels = batch.get("labels")
        if self.use_sfg and labels is not None:
            # per-feature sparse id targets, in dnn sparse-column order
            sparse_targets = {}
            for f in self._sparse_cols:
                idx = self.schema.sparse_index(f.name)
                sparse_targets[f.name] = batch["sparse"][:, idx]
            dense_targets = dv = (
                dense_vals
                if dense_vals is not None
                else jnp.zeros((sparse_stack.shape[0], 0))
            )
            fused = self.sfg_fused_ce
            if fused == "auto":
                try:
                    on_tpu_chip = (
                        jax.default_backend() == "tpu"
                        and len(jax.devices()) == 1
                    )
                except Exception:
                    on_tpu_chip = False
                if on_tpu_chip:
                    fused = "pallas"
                else:
                    logits_bytes = (
                        4
                        * sparse_stack.shape[0]
                        * sum(v for _, v in self.sfg_decoder.sparse_vocab_sizes)
                    )
                    fused = logits_bytes > 8 * 1024**3
            if fused:
                # the loss's exact per-row weight pattern (positive mask x
                # padded-tail sample mask): rows it zeroes need no CE at all,
                # so the flash-CE kernels sort them out and skip their tiles
                # (sfg.py ce_rows row_mask).  Only worth the sort under
                # positive_only — all-samples batches have no skippable
                # prefix beyond the rare padded tail.
                row_mask = None
                if self.sfg_positive_only:
                    row_mask = (labels.reshape(-1) == 1).astype(jnp.float32)
                    sm = batch.get("sample_mask")
                    if sm is not None:
                        row_mask = row_mask * sm.reshape(-1)
                ll_rows, dense_preds = self.sfg_decoder.ce_rows(
                    sparse_stack, dv, sparse_targets, labels,
                    training=training,
                    impl="pallas" if fused == "pallas" else "remat",
                    row_mask=row_mask if fused == "pallas" else None,
                )
                loss = sfg_loss_rows(
                    ll_rows,
                    dense_preds,
                    dense_targets,
                    labels,
                    sample_mask=batch.get("sample_mask"),
                    positive_only=self.sfg_positive_only,
                )
            else:
                sparse_logits, dense_preds = self.sfg_decoder(
                    sparse_stack, dv, labels, training=training
                )
                loss = sfg_loss(
                    sparse_logits,
                    dense_preds,
                    sparse_targets,
                    dense_targets,
                    labels,
                    sample_mask=batch.get("sample_mask"),
                    positive_only=self.sfg_positive_only,
                )
            if training:
                out["aux_loss"] = self.sfg_weight * loss
                out["logs"] = {"sfg_loss": loss}
        return out


class xDeepFMPro(BaseModel):
    """Reference ``xdeepfm_pro.py:31-393``."""

    def __init__(
        self, linear_feature_columns, dnn_feature_columns,
        dnn_hidden_units=(256, 256), cin_layer_size=(256, 128),
        cin_split_half=True, cin_activation="relu", l2_reg_linear=0.00001,
        l2_reg_embedding=0.00001, l2_reg_dnn=0, l2_reg_cin=0, init_std=0.0001,
        seed=1024, dnn_dropout=0, dnn_activation="relu", dnn_use_bn=False,
        task="binary", device=None, gpus=None,
        use_sfg=True, sfg_weight=0.1, sfg_hidden_units=(128, 64),
        sfg_dropout=0.1, sfg_positive_only=True, sfg_use_label_attention=True,
        sfg_fused_ce="auto",
        use_autodis=False, autodis_buckets=16, autodis_temperature=1.0,
    ):
        super().__init__(
            linear_feature_columns, dnn_feature_columns,
            l2_reg_linear=l2_reg_linear, l2_reg_embedding=l2_reg_embedding,
            init_std=init_std, seed=seed, task=task, device=device, gpus=gpus,
        )
        self.dnn_hidden_units = tuple(dnn_hidden_units)
        self.cin_layer_size = tuple(cin_layer_size)
        self.cin_split_half = cin_split_half
        self.cin_activation = cin_activation
        self.dnn_dropout = dnn_dropout
        self.dnn_activation = dnn_activation
        self.dnn_use_bn = dnn_use_bn
        self.use_sfg = use_sfg
        self.sfg_weight = sfg_weight
        self.sfg_hidden_units = tuple(sfg_hidden_units)
        self.sfg_dropout = sfg_dropout
        self.sfg_positive_only = sfg_positive_only
        self.sfg_use_label_attention = sfg_use_label_attention
        self.sfg_fused_ce = sfg_fused_ce
        self.use_autodis = use_autodis
        self.autodis_buckets = autodis_buckets
        self.autodis_temperature = autodis_temperature
        self._l2_reg_cin = l2_reg_cin
        if len(dnn_feature_columns) > 0 and len(self.dnn_hidden_units) > 0:
            self.add_regularization_weight(("dnn/", "/kernel"), l2=l2_reg_dnn)
            self.add_regularization_weight(("dnn_linear/",), l2=l2_reg_dnn)
        if len(self.cin_layer_size) > 0 and len(dnn_feature_columns) > 0:
            self.add_regularization_weight(("cin/", "conv_w"), l2=l2_reg_cin)
        self._finalize()

    @property
    def embedding_dim(self):
        sp = [f for f in self.dnn_feature_columns if isinstance(f, SparseFeat)]
        return sp[0].embedding_dim if sp else 8

    def _build_module(self):
        return XDeepFMProModule(
            linear_cols=self.linear_feature_columns,
            dnn_cols=self.dnn_feature_columns,
            schema=self.schema,
            embedding_dim=self.embedding_dim,
            dnn_hidden_units=self.dnn_hidden_units,
            cin_layer_size=self.cin_layer_size,
            cin_split_half=self.cin_split_half,
            cin_activation=self.cin_activation,
            l2_reg_cin=self._l2_reg_cin,
            init_std=self.init_std,
            seed=self.seed,
            dnn_dropout=self.dnn_dropout,
            dnn_activation=self.dnn_activation,
            dnn_use_bn=self.dnn_use_bn,
            task=self.task,
            use_sfg=self.use_sfg,
            sfg_weight=self.sfg_weight,
            sfg_hidden_units=self.sfg_hidden_units,
            sfg_dropout=self.sfg_dropout,
            sfg_positive_only=self.sfg_positive_only,
            sfg_use_label_attention=self.sfg_use_label_attention,
            sfg_fused_ce=self.sfg_fused_ce,
            use_autodis=self.use_autodis,
            autodis_buckets=self.autodis_buckets,
            autodis_temperature=self.autodis_temperature,
        )

    def get_embedding_analysis(self, x):
        """Embedding collapse diagnostics (reference ``xdeepfm_pro.py:281-322``)."""
        import jax.numpy as jnp

        batch = self._pack_x(x)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        variables = {"params": self.params}
        if self.batch_stats:
            variables["batch_stats"] = self.batch_stats
        all_embeddings = np.asarray(
            self.module.apply(
                variables,
                batch,
                method=lambda m, b: m.embedding_dict.stacked_inputs(
                    b, m.dnn_cols
                )[0],
            )
        )
        mean_embedding = all_embeddings.mean(axis=0)
        std_embedding = all_embeddings.std(axis=0, ddof=1)
        embedding_variance = float(all_embeddings.var(axis=0, ddof=1).mean())
        flat = all_embeddings.reshape(all_embeddings.shape[0], -1)
        normalized = flat / (np.linalg.norm(flat, axis=1, keepdims=True) + 1e-8)
        sim = normalized @ normalized.T
        n = sim.shape[0]
        avg_cos = (sim.sum() - np.trace(sim)) / (sim.size - n)
        return {
            "mean_embedding": mean_embedding,
            "std_embedding": std_embedding,
            "embedding_variance": embedding_variance,
            "avg_sample_cosine_similarity": float(avg_cos),
            "num_fields": all_embeddings.shape[1],
            "embedding_dim": all_embeddings.shape[2],
        }


class xDeepFMProLight(xDeepFMPro):
    """Smaller defaults (reference ``xdeepfm_pro.py:325-393``)."""

    def __init__(
        self, linear_feature_columns, dnn_feature_columns,
        dnn_hidden_units=(128, 64), cin_layer_size=(128, 64), **kwargs,
    ):
        kwargs.setdefault("sfg_weight", 0.05)
        kwargs.setdefault("sfg_hidden_units", (64, 32))
        kwargs.setdefault("autodis_buckets", 8)
        super().__init__(
            linear_feature_columns, dnn_feature_columns,
            dnn_hidden_units=dnn_hidden_units, cin_layer_size=cin_layer_size,
            **kwargs,
        )

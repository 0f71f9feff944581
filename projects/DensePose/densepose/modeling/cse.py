"""Continuous Surface Embeddings (CSE) subsystem (reference:
projects/DensePose/densepose/modeling/cse/{embedder.py,
vertex_direct_embedder.py, vertex_feature_embedder.py},
predictors/cse.py ``DensePoseEmbeddingPredictor`` and
losses/{embed.py EmbeddingLoss, soft_embed.py SoftEmbeddingLoss}).

Vertex embeddings are flax params (N, D); per-pixel embeddings come from a
deconv predictor; the loss is cross-entropy over the (points x vertices)
squared-distance score matrix — a single (J, D) x (D, K) MXU matmul per
mesh. Mesh data (vertex counts, optional geodesic distances for the soft
loss) is declared in cfg.MODEL.ROI_DENSEPOSE_HEAD.CSE.EMBEDDERS; pretrained
mesh pickles load through the checkpoint converter.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from jtsm_tpu.config import CfgNode
from jtsm_tpu.layers import ConvTranspose2d, interpolate_bilinear

from .predictors import DENSEPOSE_PREDICTOR_REGISTRY, _ChartPredictorBase

Array = jax.Array


def normalize_embeddings(embeddings: Array, epsilon: float = 1e-6) -> Array:
    """L2-normalize along the last dim (reference cse/utils.py:9)."""
    norm = jnp.linalg.norm(embeddings, axis=-1, keepdims=True)
    return embeddings / jnp.maximum(norm, epsilon)


def squared_euclidean_distance_matrix(pts1: Array, pts2: Array) -> Array:
    """(J, D) x (K, D) -> (J, K) squared distances (reference cse/utils.py:17).
    Expanded form keeps it one matmul + rank-1 updates on the MXU."""
    sq1 = jnp.sum(pts1**2, axis=1, keepdims=True)  # (J, 1)
    sq2 = jnp.sum(pts2**2, axis=1)[None, :]  # (1, K)
    return sq1 + sq2 - 2.0 * pts1 @ pts2.T


class VertexDirectEmbedder(nn.Module):
    """Learned (num_vertices, embed_dim) table (reference
    vertex_direct_embedder.py:12)."""

    num_vertices: int
    embed_dim: int

    @nn.compact
    def __call__(self) -> Array:
        emb = self.param(
            "embeddings",
            lambda k: jax.random.uniform(
                k, (self.num_vertices, self.embed_dim), minval=-0.5, maxval=0.5
            ),
        )
        return normalize_embeddings(emb)


class VertexFeatureEmbedder(nn.Module):
    """Vertex features (N, K) x feature-to-embed map (K, D) (reference
    vertex_feature_embedder.py:12). Features may be frozen (buffer)."""

    num_vertices: int
    feature_dim: int
    embed_dim: int
    train_features: bool = False

    @nn.compact
    def __call__(self) -> Array:
        init = lambda k, shape: jax.random.uniform(k, shape, minval=-0.5, maxval=0.5)
        if self.train_features:
            features = self.param(
                "features", lambda k: init(k, (self.num_vertices, self.feature_dim))
            )
        else:
            features = self.variable(
                "buffers",
                "features",
                lambda: init(
                    jax.random.key(0), (self.num_vertices, self.feature_dim)
                ),
            ).value
        embeddings = self.param(
            "embeddings", lambda k: init(k, (self.feature_dim, self.embed_dim))
        )
        return normalize_embeddings(features @ embeddings)


class Embedder(nn.Module):
    """Container of per-mesh embedders (reference embedder.py:64). Mesh `m`
    lives in submodule ``embedder_{m}``."""

    mesh_specs: Any  # dict: mesh_name -> spec dict (TYPE/NUM_VERTICES/...)
    embed_dim: int = 16

    @classmethod
    def from_config(cls, cfg: CfgNode):
        specs = {}
        for mesh_name, spec in cfg.MODEL.ROI_DENSEPOSE_HEAD.CSE.EMBEDDERS.items():
            specs[mesh_name] = {
                "TYPE": spec.get("TYPE", "vertex_direct"),
                "NUM_VERTICES": spec["NUM_VERTICES"],
                "FEATURE_DIM": spec.get("FEATURE_DIM", 0),
                "FEATURES_TRAINABLE": spec.get("FEATURES_TRAINABLE", False),
            }
        return dict(
            mesh_specs=specs, embed_dim=cfg.MODEL.ROI_DENSEPOSE_HEAD.CSE.EMBED_SIZE
        )

    def setup(self):
        mods = {}
        for mesh_name, spec in sorted(self.mesh_specs.items()):
            if spec["TYPE"] == "vertex_feature":
                mod = VertexFeatureEmbedder(
                    num_vertices=spec["NUM_VERTICES"],
                    feature_dim=spec["FEATURE_DIM"],
                    embed_dim=self.embed_dim,
                    train_features=spec["FEATURES_TRAINABLE"],
                    name=f"embedder_{mesh_name}",
                )
            else:
                mod = VertexDirectEmbedder(
                    num_vertices=spec["NUM_VERTICES"],
                    embed_dim=self.embed_dim,
                    name=f"embedder_{mesh_name}",
                )
            mods[mesh_name] = mod
        self._embedders = mods

    @property
    def mesh_names(self):
        return set(self.mesh_specs.keys())

    def __call__(self, mesh_name: Optional[str] = None):
        """Embeddings for one mesh, or a dict for all meshes when
        ``mesh_name`` is None. All embedders run every call so their params
        exist from ``init`` on (flax creates params lazily per call-path);
        each is a cheap normalize/matmul that XLA DCEs when unused."""
        outs = {name: self._embedders[name]() for name in sorted(self.mesh_specs)}
        return outs if mesh_name is None else outs[mesh_name]


@DENSEPOSE_PREDICTOR_REGISTRY.register()
class DensePoseEmbeddingPredictor(_ChartPredictorBase):
    """coarse segm + per-pixel embedding channels (reference
    predictors/cse.py:15)."""

    embed_dim: int = 16

    @classmethod
    def from_config(cls, cfg: CfgNode, dtype=jnp.float32):
        dp = cfg.MODEL.ROI_DENSEPOSE_HEAD
        return dict(
            num_coarse_segm=dp.NUM_COARSE_SEGM_CHANNELS,
            deconv_kernel=dp.DECONV_KERNEL,
            up_scale=dp.UP_SCALE,
            embed_dim=dp.CSE.EMBED_SIZE,
            dtype=dtype,
        )

    @nn.compact
    def __call__(self, x: Array) -> Dict[str, Array]:
        return {
            "coarse_segm": self._lowres(x, self.num_coarse_segm, "coarse_segm_lowres"),
            "embedding": self._lowres(x, self.embed_dim, "embed_lowres"),
        }


def embedding_loss(
    pixel_embeddings: Array,  # (J, D) point-sampled, unnormalized
    vertex_ids: Array,  # (J,) gt vertex index into the mesh
    valid: Array,  # (J,) bool
    mesh_vertex_embeddings: Array,  # (K, D) normalized
    embdist_gauss_sigma: float,
) -> Array:
    """Cross-entropy over squared-distance scores (reference
    losses/embed.py:18 ``EmbeddingLoss``)."""
    emb = normalize_embeddings(pixel_embeddings)
    scores = squared_euclidean_distance_matrix(emb, mesh_vertex_embeddings) / (
        -embdist_gauss_sigma
    )
    logp = jax.nn.log_softmax(scores, axis=-1)
    k = mesh_vertex_embeddings.shape[0]
    picked = jnp.take_along_axis(
        logp, jnp.clip(vertex_ids, 0, k - 1)[:, None], axis=1
    )[:, 0]
    w = valid.astype(jnp.float32)
    return -jnp.sum(picked * w) / jnp.maximum(w.sum(), 1.0)


def soft_embedding_loss(
    pixel_embeddings: Array,
    vertex_ids: Array,
    valid: Array,
    mesh_vertex_embeddings: Array,
    geodesic_dists: Array,  # (K, K) pairwise geodesic distances on the mesh
    embdist_gauss_sigma: float,
    geodist_gauss_sigma: float,
) -> Array:
    """Soft cross-entropy against a geodesic-distance softmax target
    (reference losses/soft_embed.py:19 ``SoftEmbeddingLoss``)."""
    emb = normalize_embeddings(pixel_embeddings)
    scores = squared_euclidean_distance_matrix(emb, mesh_vertex_embeddings) / (
        -embdist_gauss_sigma
    )
    logp = jax.nn.log_softmax(scores, axis=-1)
    k = mesh_vertex_embeddings.shape[0]
    gd = geodesic_dists[jnp.clip(vertex_ids, 0, k - 1)]  # (J, K)
    target = jax.nn.softmax(gd**2 / (-geodist_gauss_sigma), axis=-1)
    w = valid.astype(jnp.float32)
    per_pt = -jnp.sum(target * logp, axis=-1)
    return jnp.sum(per_pt * w) / jnp.maximum(w.sum(), 1.0)


class MeshCatalog:
    """Mesh name <-> id mapping (reference densepose/data/meshes/catalog.py).
    Ids are assigned in sorted-name order at embedder construction."""

    _name_to_id: Dict[str, int] = {}
    _id_to_name: Dict[int, str] = {}

    @classmethod
    def register_meshes(cls, names):
        for name in sorted(names):
            if name not in cls._name_to_id:
                i = len(cls._name_to_id)
                cls._name_to_id[name] = i
                cls._id_to_name[i] = name

    @classmethod
    def get_mesh_id(cls, name: str) -> int:
        return cls._name_to_id[name]

    @classmethod
    def get_mesh_name(cls, mesh_id: int) -> str:
        return cls._id_to_name[mesh_id]


from jtsm_tpu.config import CfgNode as _CfgNode  # noqa: E402

from .losses import DENSEPOSE_LOSS_REGISTRY, _point_sample  # noqa: E402


@DENSEPOSE_LOSS_REGISTRY.register()
class DensePoseCseLoss:
    """CSE loss (reference losses/cse.py ``DensePoseCseLoss``): for each
    mesh, cross-entropy over squared-distance scores between point-sampled
    pixel embeddings and that mesh's vertex embeddings. Targets carry
    per-roi mesh ids (``pt_mesh``) and per-point gt vertex ids
    (``pt_vertex``). The soft variant additionally needs geodesic distance
    matrices, passed via ``geodesic_dists`` (mesh_name -> (K, K)); when
    absent it falls back to the hard cross-entropy."""

    def __init__(self, cfg: _CfgNode):
        cse = cfg.MODEL.ROI_DENSEPOSE_HEAD.CSE
        self.embed_loss_weight = cse.EMBED_LOSS_WEIGHT
        self.embdist_gauss_sigma = cse.EMBEDDING_DIST_GAUSS_SIGMA
        self.geodist_gauss_sigma = cse.GEODESIC_DIST_GAUSS_SIGMA
        self.soft = cse.EMBED_LOSS_NAME == "SoftEmbeddingLoss"

    def __call__(
        self,
        outputs: Dict[str, Array],
        targets: Dict[str, Array],
        roi_valid: Array,
        embeddings: Optional[Dict[str, Array]] = None,
        geodesic_dists: Optional[Dict[str, Array]] = None,
    ) -> Dict[str, Array]:
        assert embeddings is not None, "CSE loss needs mesh vertex embeddings"
        pts = targets["pt_coords"]  # (N, P, 2)
        vert = targets.get("pt_vertex")
        if vert is None:
            # no CSE annotations in this batch: anchor the params with a
            # zero-valued loss (reference EmbeddingLoss.fake_value)
            zero = outputs["embedding"].sum() * 0.0
            zero = zero + sum(e.sum() * 0.0 for e in embeddings.values())
            return {"loss_densepose_E": zero}
        mesh_ids = targets["pt_mesh"].astype(jnp.int32)  # (N,)
        w = targets["pt_valid"] & (roi_valid[:, None] > 0)

        pix = _point_sample(outputs["embedding"], pts)  # (N, P, D)
        n, p, d = pix.shape
        flat_pix = pix.reshape(n * p, d)
        flat_vert = vert.reshape(n * p).astype(jnp.int32)

        total = 0.0
        for mesh_name in sorted(embeddings):
            mid = MeshCatalog.get_mesh_id(mesh_name)
            mesh_mask = (jnp.broadcast_to(mesh_ids[:, None], (n, p)) == mid) & w
            flat_valid = mesh_mask.reshape(n * p)
            mesh_emb = embeddings[mesh_name]
            gd = (geodesic_dists or {}).get(mesh_name)
            if self.soft and gd is not None:
                loss = soft_embedding_loss(
                    flat_pix,
                    flat_vert,
                    flat_valid,
                    mesh_emb,
                    gd,
                    self.embdist_gauss_sigma,
                    self.geodist_gauss_sigma,
                )
            else:
                loss = embedding_loss(
                    flat_pix,
                    flat_vert,
                    flat_valid,
                    mesh_emb,
                    self.embdist_gauss_sigma,
                )
            # zero when the mesh has no annotated points in the batch
            has_any = flat_valid.any()
            total = total + jnp.where(has_any, loss, mesh_emb.sum() * 0.0)
        return {"loss_densepose_E": total * self.embed_loss_weight}

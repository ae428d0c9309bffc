"""Model composer — encoder/decoder dispatch by config (reference ``models/model.py:9-64``).

``enc_type`` in {dgcnn_fps, vn_dgcnn_fps, vn_pointnet, vn_pointr};
``dec_type`` in {foldingnet, vn_foldingnet, attention_vn_foldingnet}.
``num_coarse == 448`` encoders return a (coarse_for_decoder, coarse_for_loss)
pair — the decoder folds around the 224 predicted points, the loss sees the
448-point concat (reference :52-64).

Encoder freezing (``enc_pretrained`` / ``freeze_encoder`` / ``freeze_decoder``)
is handled in the trainer via optax parameter masks — functional JAX has no
``requires_grad``; see ``training/trainer.py``.
"""

from __future__ import annotations

import flax.linen as nn

from vn_pointcloudcompletion_tpu.models.dgcnn import DGCNNfps, VNDGCNNfps
from vn_pointcloudcompletion_tpu.models.pcn import (
    AttentionVNFoldingNet,
    FoldingNet,
    VNFoldingNet,
    VNPointNet,
)
from vn_pointcloudcompletion_tpu.models.pointr import VNPCTransformer
from vn_pointcloudcompletion_tpu.utils.config import Config

ENCODERS = ("dgcnn_fps", "vn_dgcnn_fps", "vn_pointnet", "vn_pointr")
DECODERS = ("foldingnet", "vn_foldingnet", "attention_vn_foldingnet")


class PCNNet(nn.Module):
    """The single composed completion model (reference ``models/model.py``)."""

    enc_type: str = "vn_pointnet"
    dec_type: str = "vn_foldingnet"
    num_coarse: int = 1024
    latent_dim: int = 2048
    only_coarse: bool = False
    # PoinTr-proper rebuild: run the vn_pointr encoder's 8-block decoder
    # stack (models/pointr.py:347-399) and condition the fold on the refined
    # per-query features.  Off by default — the reference hardcodes
    # only_coarse=True there (model.py:23-24), leaving its decoder dead.
    pointr_decoder: bool = False

    @nn.compact
    def __call__(self, xyz, rot=None, train: bool = False):
        import jax.numpy as jnp

        def f32(t):
            # outputs at least f32 (bf16 compute promotes; f64 untouched)
            if t is None:
                return None
            return t.astype(jnp.promote_types(t.dtype, jnp.float32))

        if self.pointr_decoder and self.enc_type != "vn_pointr":
            raise ValueError(
                "pointr_decoder=True requires enc_type='vn_pointr' (it is "
                "that encoder's transformer decoder stack)"
            )
        # only_coarse discards the fine output, so never pay for the 8-block
        # decoder stack underneath it
        use_pointr_dec = self.pointr_decoder and not self.only_coarse

        if self.enc_type == "dgcnn_fps":
            encoder = DGCNNfps(self.num_coarse, latent_dim=1024, name="encoder")
        elif self.enc_type == "vn_dgcnn_fps":
            encoder = VNDGCNNfps(self.num_coarse, name="encoder")
        elif self.enc_type == "vn_pointnet":
            encoder = VNPointNet(self.num_coarse, name="encoder")
        elif self.enc_type == "vn_pointr":
            if self.num_coarse != 448:
                raise ValueError(
                    "enc_type='vn_pointr' requires num_coarse=448 (224 "
                    "predicted + 224 FPS; reference model.py:23-24 contract)"
                )
            encoder = VNPCTransformer(
                embed_dim=384, enc_depth=6, dec_depth=8, num_query=224,
                knn_layer=1, dgcnn="vn_dgcnn", trans="vn_trans",
                only_coarse=not use_pointr_dec, name="encoder",
            )
        else:
            raise ValueError(f"encoder type {self.enc_type} not supported")

        coarse, feature_global = encoder(xyz, train=train)

        query_feats = None
        if use_pointr_dec:
            # decoder-stack output: (global_feature, refined query features)
            feature_global, query_feats = feature_global

        if self.only_coarse:
            if self.num_coarse == 448:
                return f32(coarse[1]), None
            return f32(coarse), None

        if self.dec_type == "vn_foldingnet":
            decoder = VNFoldingNet(self.num_coarse, self.latent_dim, name="decoder")
        elif self.dec_type == "foldingnet":
            decoder = FoldingNet(self.num_coarse, name="decoder")
        elif self.dec_type == "attention_vn_foldingnet":
            decoder = AttentionVNFoldingNet(
                self.num_coarse, self.latent_dim, name="decoder"
            )
        else:
            raise ValueError(f"decoder type {self.dec_type} not supported")

        dec_kwargs = {}
        if query_feats is not None:
            if self.dec_type != "attention_vn_foldingnet":
                raise ValueError(
                    "pointr_decoder=True requires "
                    "dec_type='attention_vn_foldingnet' (the per-query fold)"
                )
            dec_kwargs["center_feats"] = query_feats

        if self.num_coarse == 448:
            fine = decoder(coarse[0], feature_global, rot, train=train,
                           **dec_kwargs)
            return f32(coarse[1]), f32(fine)
        fine = decoder(coarse, feature_global, rot, train=train, **dec_kwargs)
        return f32(coarse), f32(fine)


def build_model(config: Config) -> PCNNet:
    """Construct PCNNet from a reference-compatible config."""
    return PCNNet(
        enc_type=config.enc_type,
        dec_type=config.dec_type,
        num_coarse=config.num_coarse,
        latent_dim=config.latent_dim,
        only_coarse=config.only_coarse,
        pointr_decoder=getattr(config, "pointr_decoder", False),
    )

"""multimodalmusig_tpu — TPU-native multi-modal mutation-signature topic models.

A from-scratch JAX/XLA/Pallas re-architecture of the capabilities of
shahcompbio/MultiModalMuSig.jl (reference mounted at /root/reference): four
Bayesian topic models (LDA, ILDA, MMCTM, IMMCTM) fit by coordinate-ascent
variational inference, with the reference's public surface
(src/MultiModalMuSig.jl:9 exports) plus TPU-first extensions (vmapped
multi-restart fitting, device-mesh sharding, jitted fit loops).
"""

from .models.ilda import ILDA, fit_heldout as ilda_fit_heldout, transform as ilda_transform
from .models.immctm import (
    IMMCTM,
    fit_heldout as immctm_fit_heldout,
    predict_modality_eta as immctm_predict_modality_eta,
    transform as immctm_transform,
)
from .models.lda import LDA, fit_heldout as lda_fit_heldout, transform as lda_transform
from .models.mmctm import (
    CTM,
    MMCTM,
    fit_heldout as mmctm_fit_heldout,
    predict_modality_eta as mmctm_predict_modality_eta,
    transform as mmctm_transform,
)
from .parallel.restarts import fit_mmctm_restarts
from .utils.formatting import (
    format_counts_ctm,
    format_counts_lda,
    format_counts_mmctm,
    make_count_matrix,
)
from .utils.io import load_model, save_model

__version__ = "0.1.0"

__all__ = [
    "LDA",
    "ILDA",
    "CTM",
    "MMCTM",
    "IMMCTM",
    "format_counts_lda",
    "format_counts_ctm",
    "format_counts_mmctm",
    "make_count_matrix",
    "transform",
    "fit_heldout",
    "predict_modality_eta",
    "fit_mmctm_restarts",
    "save_model",
    "load_model",
]

# Generic dispatch mirroring Julia's multiple dispatch on fit!/transform/...
_TRANSFORM_DISPATCH = {
    LDA: lda_transform,
    ILDA: ilda_transform,
    MMCTM: mmctm_transform,
    IMMCTM: immctm_transform,
}
_FIT_HELDOUT_DISPATCH = {
    LDA: lda_fit_heldout,
    ILDA: ilda_fit_heldout,
    MMCTM: mmctm_fit_heldout,
    IMMCTM: immctm_fit_heldout,
}


def transform(model, X, **kwargs):
    """Dispatch to the model-specific transform (reference: `transform` methods)."""
    for cls, fn in _TRANSFORM_DISPATCH.items():
        if isinstance(model, cls):
            return fn(model, X, **kwargs)
    raise TypeError(f"no transform for {type(model)!r}")


def fit_heldout(Xheldout, model, **kwargs):
    """Dispatch to the model-specific fit_heldout (reference: `fit_heldout`)."""
    for cls, fn in _FIT_HELDOUT_DISPATCH.items():
        if isinstance(model, cls):
            return fn(Xheldout, model, **kwargs)
    raise TypeError(f"no fit_heldout for {type(model)!r}")


def predict_modality_eta(Xobs, m, model, **kwargs):
    """Dispatch `predict_modality_η(Xobs, m, model)` (1-based m, as in Julia)."""
    if isinstance(model, IMMCTM):
        return immctm_predict_modality_eta(Xobs, m, model, **kwargs)
    if isinstance(model, MMCTM):
        return mmctm_predict_modality_eta(Xobs, m, model, **kwargs)
    raise TypeError(f"no predict_modality_eta for {type(model)!r}")

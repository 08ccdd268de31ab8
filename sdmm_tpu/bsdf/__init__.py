from .bsdf import (
    gather_params,
    eval_pdf,
    eval_pdf_full,
    sample,
    sample_full,
    is_delta_only,
    has_smooth,
)

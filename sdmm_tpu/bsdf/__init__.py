from .bsdf import gather_params, eval_pdf, sample, is_delta_only, has_smooth

from homonim_spark.kernel.models import KernelModelParams, fit_model, apply_model  # noqa: F401

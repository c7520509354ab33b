"""Pipeline orchestration (reference: simpleprocess.cc / improcfun.cc L4)."""

from art_tpu.pipeline.develop import (  # noqa: F401
    PipelineConfig,
    plan,
    develop,
    process_image,
)

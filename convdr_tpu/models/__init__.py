from convdr_tpu.models.encoders import (  # noqa: F401
    AnceEncoder,
    DPRBiEncoder,
    build_model,
)
from convdr_tpu.models.transformer import TransformerEncoder  # noqa: F401

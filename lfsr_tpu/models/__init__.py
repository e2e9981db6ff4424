"""Model zoo. Importing this package registers every model by name.

Contract (mirrors the reference's model/SR plugin interface,
train.py:48-50): ``registry.get_model(cfg)`` returns a flax module whose
``__call__(x)`` maps an NHWC LR SAI mosaic ``[B, A*h, A*w, 1]`` to the SR
mosaic ``[B, A*h*s, A*w*s, 1]``; ``registry.get_loss(cfg)`` returns the
model's training loss ``(sr, hr) -> scalar``.
"""

from lfsr_tpu.models import registry  # noqa: F401
from lfsr_tpu.models import cnn_baselines  # noqa: F401  (VDSR, EDSR, RCAN)
from lfsr_tpu.models import lf_internet  # noqa: F401
from lfsr_tpu.models import distg_ssr  # noqa: F401
from lfsr_tpu.models import epit  # noqa: F401
from lfsr_tpu.models import lfmambax  # noqa: F401
from lfsr_tpu.models import lft  # noqa: F401
from lfsr_tpu.models import lfssr  # noqa: F401
from lfsr_tpu.models import lf_ato  # noqa: F401
from lfsr_tpu.models import reslf  # noqa: F401
from lfsr_tpu.models import efficient_lfnet_v2  # noqa: F401
from lfsr_tpu.models import efficient_lfnet_v64  # noqa: F401
from lfsr_tpu.models import efficient_lfnet_v5  # noqa: F401
from lfsr_tpu.models import lf_iinet  # noqa: F401
from lfsr_tpu.models import meg_net  # noqa: F401
from lfsr_tpu.models import hlfsr  # noqa: F401
from lfsr_tpu.models import lf_det  # noqa: F401
from lfsr_tpu.models import dpt  # noqa: F401
from lfsr_tpu.models import lfssr_sav  # noqa: F401
from lfsr_tpu.models import lf_dfnet  # noqa: F401
from lfsr_tpu.models import efficient_lfnet_v3  # noqa: F401
from lfsr_tpu.models import efficient_lfnet_v7  # noqa: F401
from lfsr_tpu.models import efficient_lfnet_v4_5  # noqa: F401
from lfsr_tpu.models import efficient_lfnet_v6  # noqa: F401
from lfsr_tpu.models import efficient_lfnet_v63  # noqa: F401
from lfsr_tpu.models import efficient_lfnet_variants  # noqa: F401

from lfsr_tpu.models.registry import get_model, get_loss, available  # noqa: F401

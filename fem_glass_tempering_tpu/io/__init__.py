from fem_glass_tempering_tpu.io.vtu import write_vtu, VTUSeriesWriter  # noqa: F401
from fem_glass_tempering_tpu.io.xdmf import XDMFWriter  # noqa: F401
from fem_glass_tempering_tpu.io.series import NPZSeriesWriter  # noqa: F401
from fem_glass_tempering_tpu.io.checkpoint import (  # noqa: F401
    save_checkpoint,
    load_checkpoint,
)

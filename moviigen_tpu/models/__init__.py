from . import wan_model
from . import vae
from . import t5

__all__ = ["wan_model", "vae", "t5"]

# NOTE: utils.io is intentionally not imported here — it imports the model
# classes, and the models import utils.formatting, so an eager import would
# be circular. Import it as `multimodalmusig_tpu.utils.io` (the top-level
# package re-exports save_model/load_model after models are loaded).
from . import formatting  # noqa: F401

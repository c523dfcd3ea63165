"""Per-TPU-generation kernel tuning tables."""
from loops_tpu.tuning.launch_box import LaunchParams, launch_params  # noqa: F401

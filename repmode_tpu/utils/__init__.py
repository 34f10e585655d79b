from repmode_tpu.utils.logging import setup_logger
from repmode_tpu.utils.timing import PhaseTimer
from repmode_tpu.utils.tracking import Tracker

__all__ = ["setup_logger", "PhaseTimer", "Tracker"]

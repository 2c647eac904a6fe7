"""Framework-side utilities (TensorBoard event writer, etc.)."""

from .tbevents import EventWriter, read_events

__all__ = ["EventWriter", "read_events"]

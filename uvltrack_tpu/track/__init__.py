from .tracker import JitTracker, Tracker, TrackerState

__all__ = ["JitTracker", "Tracker", "TrackerState"]

from lanetpu.runtime.engine import Engine, XLAEngine, load_engine
from lanetpu.runtime.lane import LaneSegmenter
from lanetpu.runtime.points import LanePointsRegressor
from lanetpu.runtime.detector import YoloEngine

__all__ = [
    "Engine",
    "XLAEngine",
    "load_engine",
    "LaneSegmenter",
    "LanePointsRegressor",
    "YoloEngine",
]

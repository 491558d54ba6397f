from lanetpu.pipeline.channels import Bus, Channel
from lanetpu.pipeline.streaming import StreamingRunner, LaneStreamNode

__all__ = ["Bus", "Channel", "StreamingRunner", "LaneStreamNode"]

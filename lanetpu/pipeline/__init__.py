from lanetpu.pipeline.channels import Bus, Channel
from lanetpu.pipeline.streaming import StreamingRunner, LaneStreamNode
from lanetpu.pipeline.camera import CameraSource
from lanetpu.pipeline.transport import BusServer, RemoteBus

__all__ = ["Bus", "Channel", "StreamingRunner", "LaneStreamNode",
           "CameraSource", "BusServer", "RemoteBus"]

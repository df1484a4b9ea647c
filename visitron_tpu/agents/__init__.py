from visitron_tpu.agents.runtime import NavRuntime
from visitron_tpu.agents.speaker import SpeakerAgent
from visitron_tpu.agents.viewpoint import ViewpointAgent

__all__ = ["NavRuntime", "SpeakerAgent", "ViewpointAgent"]

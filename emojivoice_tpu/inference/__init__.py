from emojivoice_tpu.inference.pipeline import SynthesisPipeline, SynthesisResult
from emojivoice_tpu.inference.serving import BatchingEngine

__all__ = ["SynthesisPipeline", "SynthesisResult", "BatchingEngine"]

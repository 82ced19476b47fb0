from emojivoice_tpu.inference.pipeline import SynthesisPipeline, SynthesisResult

__all__ = ["SynthesisPipeline", "SynthesisResult"]

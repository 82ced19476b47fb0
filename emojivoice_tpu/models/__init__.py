from emojivoice_tpu.models.matcha import MatchaTTS
from emojivoice_tpu.models.text_encoder import TextEncoder
from emojivoice_tpu.models.decoder import Decoder
from emojivoice_tpu.models.cfm import CFM

__all__ = ["MatchaTTS", "TextEncoder", "Decoder", "CFM"]

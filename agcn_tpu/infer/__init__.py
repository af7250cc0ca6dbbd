from agcn_tpu.infer.preprocess import InferencePreprocessor, StreamBuffer
from agcn_tpu.infer.realtime import ActionRecognition, filter_logits

__all__ = ["InferencePreprocessor", "StreamBuffer", "ActionRecognition",
           "filter_logits"]

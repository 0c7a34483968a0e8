from tpu_captioner.eval.bleu import corpus_bleu
from tpu_captioner.eval.metrics import (
    AverageMeter,
    decode_lengths_from_sequences,
    rollout_token_mask,
    topk_correct,
)

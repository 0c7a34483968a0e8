from tpu_captioner.infer.beam import BeamResult, beam_search, beam_search_batch

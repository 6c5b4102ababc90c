from image_search_tpu.tokenizer.bpe import CLIPBPETokenizer, HashTokenizer, train_bpe

__all__ = ["CLIPBPETokenizer", "HashTokenizer", "train_bpe"]

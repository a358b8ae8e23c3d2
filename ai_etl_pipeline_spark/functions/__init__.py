from .portable import md5_i64, minhash_signature_cols, tokens_col

__all__ = ["md5_i64", "minhash_signature_cols", "tokens_col"]

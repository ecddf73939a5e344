from .band import band_score, band_score_reference, use_pallas

__all__ = ["band_score", "band_score_reference", "use_pallas"]

from .matcher import MatchResult, match_pair, match_all_pairs, match_adjacent_pairs

__all__ = ["MatchResult", "match_pair", "match_all_pairs", "match_adjacent_pairs"]

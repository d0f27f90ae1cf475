"""(queries registered incrementally)"""

"""(filled in per SURVEY §7 build plan)"""

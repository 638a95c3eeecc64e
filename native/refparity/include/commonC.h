/* Shim for sonLib's commonC.h: cPecanRealign.c only uses the struct List
 * helpers and the cigar/alignment constructors, which live in
 * pairwiseAlignment.h here. */
#ifndef CPECAN_TPU_COMMONC_SHIM_H
#define CPECAN_TPU_COMMONC_SHIM_H

#include "sonLib.h"
#include "pairwiseAlignment.h"
#include "bioioC.h"

#endif

/* Minimal single-process MPI stand-in so the READ-ONLY reference sketch
 * kernels (/root/reference/ParallelDDSketch/src/{MapSketch,ArraySketch,
 * Merger,Summary}.cc) can be compiled into a golden-dump harness on a box
 * without an MPI installation.
 *
 * Only the surface those four translation units touch is provided:
 * MPI_Pack/MPI_Unpack over MPI_DOUBLE/MPI_INT/MPI_LONG, plus no-op rank
 * plumbing. Pack/Unpack are contiguous memcpy at increasing offsets —
 * self-consistent because BOTH the packer (Summary.cc pack_SketchesPair)
 * and the unpacker (Merger.cc deserializeMsgPair) run against this same
 * shim inside one process, which is also what a homogeneous-cluster MPI
 * does for these primitive types.
 */
#ifndef MPI_SHIM_H
#define MPI_SHIM_H

#include <stdlib.h>
#include <string.h>

typedef int MPI_Comm;
typedef int MPI_Datatype;
typedef int MPI_Op;
typedef void(MPI_User_function)(void *, void *, int *, MPI_Datatype *);

#define MPI_COMM_WORLD 0
#define MPI_SUCCESS 0
#define MPI_DOUBLE 1
#define MPI_INT 2
#define MPI_LONG 3
#define MPI_PACKED 4
#define MPI_MAX 5
#define MPI_SUM 6

static inline int mpi_shim_extent(MPI_Datatype t) {
    switch (t) {
        case MPI_DOUBLE: return (int)sizeof(double);
        case MPI_INT: return (int)sizeof(int);
        case MPI_LONG: return (int)sizeof(long);
        default: return 1;
    }
}

static inline int MPI_Pack(const void *inbuf, int count, MPI_Datatype t,
                           void *outbuf, int outsize, int *position,
                           MPI_Comm comm) {
    (void)outsize; (void)comm;
    int n = count * mpi_shim_extent(t);
    memcpy((char *)outbuf + *position, inbuf, (size_t)n);
    *position += n;
    return MPI_SUCCESS;
}

static inline int MPI_Unpack(const void *inbuf, int insize, int *position,
                             void *outbuf, int count, MPI_Datatype t,
                             MPI_Comm comm) {
    (void)insize; (void)comm;
    int n = count * mpi_shim_extent(t);
    memcpy(outbuf, (const char *)inbuf + *position, (size_t)n);
    *position += n;
    return MPI_SUCCESS;
}

static inline int MPI_Pack_size(int count, MPI_Datatype t, MPI_Comm comm,
                                int *size) {
    (void)comm;
    *size = count * mpi_shim_extent(t);
    return MPI_SUCCESS;
}

static inline int MPI_Init(int *argc, char ***argv) {
    (void)argc; (void)argv;
    return MPI_SUCCESS;
}
static inline int MPI_Finalize(void) { return MPI_SUCCESS; }
static inline int MPI_Comm_rank(MPI_Comm comm, int *rank) {
    (void)comm;
    *rank = 0;
    return MPI_SUCCESS;
}
static inline int MPI_Comm_size(MPI_Comm comm, int *size) {
    (void)comm;
    *size = 1;
    return MPI_SUCCESS;
}
static inline int MPI_Abort(MPI_Comm comm, int code) {
    (void)comm;
    exit(code);
}
static inline double MPI_Wtime(void) { return 0.0; }
static inline int MPI_Barrier(MPI_Comm comm) {
    (void)comm;
    return MPI_SUCCESS;
}

#endif /* MPI_SHIM_H */

// Minimal stand-in for boost::alignment::aligned_allocator so the reference
// pair-HMM headers (which only use it as a vector allocator) compile without
// a boost installation. Test-fixture only.
#ifndef SHIM_ALIGNED_ALLOCATOR_HPP
#define SHIM_ALIGNED_ALLOCATOR_HPP
#include <cstdlib>
#include <cstddef>
#include <new>
namespace boost { namespace alignment {
template <typename T, std::size_t Align = alignof(T)>
struct aligned_allocator {
    using value_type = T;
    aligned_allocator() = default;
    template <typename U> aligned_allocator(const aligned_allocator<U, Align>&) noexcept {}
    T* allocate(std::size_t n) {
        void* p = aligned_alloc(Align < alignof(T) ? alignof(T) : Align, ((n * sizeof(T) + 63) / 64) * 64);
        if (!p) throw std::bad_alloc{};
        return static_cast<T*>(p);
    }
    void deallocate(T* p, std::size_t) noexcept { std::free(p); }
    template <typename U> struct rebind { using other = aligned_allocator<U, Align>; };
    bool operator==(const aligned_allocator&) const noexcept { return true; }
    bool operator!=(const aligned_allocator&) const noexcept { return false; }
};
}}
#endif
